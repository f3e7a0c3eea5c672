#!/bin/sh
# Fetch the demo test video (parity with the reference's
# scripts/download_video.sh, which pulls a dance clip via yt-dlp).
# Falls back to synthesizing a test clip with moving figures when the
# host has no network access.
set -e
OUT="${1:-data/dance_video.mp4}"
mkdir -p "$(dirname "$OUT")"

if command -v yt-dlp >/dev/null 2>&1; then
    yt-dlp -f 'bestvideo[height<=720]' -o "$OUT" \
        "https://www.youtube.com/watch?v=2S24-y0Ij3Y" && exit 0
fi

echo "yt-dlp unavailable or offline; synthesizing a test video instead."
python "$(dirname "$0")/make_test_video.py" --out "$OUT"
