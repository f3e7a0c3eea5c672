"""Host-side utilities: video I/O, drawing, profiling."""
