#!/usr/bin/env bash
# Extract frames from VidVRD videos: videos/<vid>.mp4 -> image/<vid>/%05d.jpg
# (same layout as the reference's vidvrd_to_image.sh). Requires ffmpeg.
set -e
DATA_DIR="${1:-./data/vidvrd}"
OUT_DIR="${2:-$DATA_DIR/image}"
command -v ffmpeg >/dev/null || { echo "ffmpeg not found on PATH" >&2; exit 1; }
for f in "$DATA_DIR"/videos/*.mp4; do
  vid="$(basename "$f" .mp4)"
  mkdir -p "$OUT_DIR/$vid"
  ffmpeg -nostdin -loglevel error -i "$f" -qscale:v 2 "$OUT_DIR/$vid/%05d.jpg"
  echo "$vid"
done
