#!/bin/bash
# Build the real-xapian rank-identity oracle:
#   1. compile xapian-core 1.4.17 from the reference's bundled tarball
#      (static lib) into $PREFIX
#   2. compile tools/xapian_oracle.cc against it
# Result: $PREFIX/bin/xapian_oracle — tests/test_xapian_parity.py runs it
# when present (and skips cleanly when not).
set -euo pipefail
PREFIX="${XAPIAN_PREFIX:-/tmp/xapian-install}"
SRC=/tmp/xapian-core-1.4.17
TARBALL=/root/reference/xapian-core-1.4.17.tar.xz
REPO="$(cd "$(dirname "$0")/.." && pwd)"

if [ ! -f "$PREFIX/lib/libxapian.a" ]; then
    [ -d "$SRC" ] || tar xf "$TARBALL" -C /tmp
    cd "$SRC"
    # -include limits: xapian 1.4.17 predates GCC13's pruned transitive
    # includes (numeric_limits used without <limits> in api/omdocument.cc)
    ./configure --disable-shared --prefix="$PREFIX" \
        CXXFLAGS="-O1 -g0 -include limits"
    make -j"$(nproc)" || make
    make install
fi

mkdir -p "$PREFIX/bin"
g++ -O1 -o "$PREFIX/bin/xapian_oracle" "$REPO/tools/xapian_oracle.cc" \
    -I"$PREFIX/include" -L"$PREFIX/lib" -lxapian -lz -luuid -lrt
echo "built $PREFIX/bin/xapian_oracle"
