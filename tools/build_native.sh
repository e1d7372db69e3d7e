#!/usr/bin/env bash
# Build the native decode library (FFmpeg demux/decode + swscale resize).
set -e
cd "$(dirname "$0")/.."
mkdir -p native/build
g++ -O3 -fPIC -shared -o native/build/libvidil_decode.so native/video_decode.cpp \
    -lavformat -lavcodec -lavutil -lswscale
echo "built native/build/libvidil_decode.so"
