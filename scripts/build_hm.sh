#!/bin/sh
# Builds the HEVC HM-16.15 reference encoder (TAppEncoderStatic) from
# the vendored tree in the reference repo, out of this repo's source
# tree (HM is a third-party benchmark binary per SURVEY.md section 2.3
# item 6 - invoked via subprocess, never re-implemented or vendored).
#
# The tree is copied to build/HM-16.15 (gitignored) and patched for
# modern GCC: HM-16.15 compiles with -Werror and trips
# -Wclass-memaccess (and friends) under g++ >= 8, so the warning set is
# relaxed and gnu++11 pinned. Only the encoder app and the libraries it
# links are built.
#
# Usage: scripts/build_hm.sh [path-to-HM-16.15-source]
# Result: build/HM-16.15/bin/TAppEncoderStatic (auto-discovered by
# tests/test_codecs.py and usable as --hevc_encoder for the RD study).
set -e

repo="$(cd "$(dirname "$0")/.." && pwd)"
src="${1:-/root/reference/kodak_tensorflow/hevc/HM-16.15}"
dst="$repo/build/HM-16.15"

if [ ! -f "$dst/build/linux/makefile" ]; then
  mkdir -p "$repo/build"
  cp -r "$src" "$dst"
fi
sed -i 's/-Wall -Wshadow -Wno-sign-compare -Werror/-Wall -Wshadow -Wno-sign-compare -Wno-class-memaccess -Wno-misleading-indentation -Wno-unused-variable -Wno-maybe-uninitialized -std=gnu++11/' \
  "$dst/build/linux/common/makefile.base"

cd "$dst/build/linux"
for t in lib/TLibVideoIO lib/TLibCommon lib/TLibDecoder lib/TLibEncoder \
         lib/TAppCommon app/TAppEncoder; do
  make -C "$t" release MM32=0 -j"$(nproc)"
done
echo "built: $dst/bin/TAppEncoderStatic"
