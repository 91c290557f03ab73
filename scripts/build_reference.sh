#!/usr/bin/env bash
# Build the reference MODS binary (/root/reference) against the system OpenCV 4,
# using the compatibility patch in scripts/refbuild_opencv4.patch, into
# /root/repo/.refbuild (gitignored). Produces .refbuild/b/mods.
#
# The reference expects OpenCV 2.4 (reference README.md:13-31); this image ships
# OpenCV 4/5 headers, so the patch adds a small compat shim (cv.h/cxcore.h C-API
# aliases, legacy constant names) and CMake fixes. No algorithmic changes.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
REF=/root/reference
RB="$REPO/.refbuild"

rm -rf "$RB/src" "$RB/b"
mkdir -p "$RB/src" "$RB/b"
cp -r "$REF"/. "$RB/src"/
chmod -R u+w "$RB/src"
(cd "$RB" && patch -p0 -d src --merge < "$REPO/scripts/refbuild_opencv4.patch" >/dev/null) || \
(cd "$RB" && patch -p1 -d src < "$REPO/scripts/refbuild_opencv4.patch")

cd "$RB/b"
cmake "$RB/src" -DCMAKE_BUILD_TYPE=Release -G Ninja >cmake.log 2>&1 || { tail -30 cmake.log; exit 1; }
ninja mods >build.log 2>&1 || { tail -40 build.log; exit 1; }
echo "Built: $RB/b/mods"
