#!/usr/bin/env bash
# Build the reference VPIC (/root/reference, read-only) as a single-rank
# binary-producing toolchain, without CMake or a system MPI.
#
#   - scalar portable backend (no USE_V4/V8/V16), -DVPIC_USE_PTHREADS
#   - MPI provided by csrc/mpistub (single-process; see mpistub/mpi.h)
#   - build tree in /tmp/vpic_ref_build (reference tree is never written)
#
# Produces:  /tmp/vpic_ref_build/libvpic.a
#            /tmp/vpic_ref_build/vpicc  (deck compiler: vpicc deck.cxx out)
#
# Usage: bash scripts/build_reference.sh
set -e

REF=/root/reference
STUB=/root/repo/csrc/mpistub
BUILD=${BUILD:-/tmp/vpic_ref_build}
JOBS=$(nproc)

mkdir -p "$BUILD/obj"
cd "$BUILD"

# mpistub
gcc -O2 -c "$STUB/mpi.c" -I"$STUB" -o obj/mpistub.o

CFLAGS="-O2 -g -fno-strict-aliasing -DVPIC_USE_PTHREADS -I$STUB -I$REF/src"
CXXFLAGS="$CFLAGS -std=c++11"

# All library sources, excluding SIMD backends (header-only anyway) and the
# rng self-test main.
SRCS=$(find "$REF/src" \( -name '*.c' -o -name '*.cc' \) \
       | grep -v -E '/v4/|/v8/|/v16/|util/rng/test/')

echo "compiling $(echo "$SRCS" | wc -l) sources with $JOBS jobs..."
compile_one() {
  src="$1"
  obj="obj/$(echo "${src#/root/reference/src/}" | tr '/' '_').o"
  case "$src" in
    *.cc) g++ $CXXFLAGS -c "$src" -o "$obj" ;;
    *.c)  gcc -std=gnu99 $CFLAGS -c "$src" -o "$obj" ;;
  esac
}
export -f compile_one 2>/dev/null || true

pids=0
for src in $SRCS; do
  compile_one "$src" &
  pids=$((pids+1))
  if [ $((pids % JOBS)) -eq 0 ]; then wait; fi
done
wait

ar rcs libvpic.a obj/*.o
echo "libvpic.a built: $(ar t libvpic.a | wc -l) objects"

# Deck compiler wrapper (mirrors bin/vpic.in: main.cc + wrapper.cc with
# -DINPUT_DECK=<deck>, linked against libvpic.a + mpistub).
cat > vpicc <<EOF
#!/usr/bin/env bash
# usage: vpicc <deck.cxx> <output-binary>
set -e
deck=\$(readlink -f "\$1")
out="\$2"
g++ $CXXFLAGS -I"\$(dirname "\$deck")" -DINPUT_DECK="\$deck" \\
    $REF/deck/main.cc $REF/deck/wrapper.cc \\
    -o "\$out" $BUILD/libvpic.a -lpthread -ldl -lm
EOF
chmod +x vpicc
echo "vpicc ready at $BUILD/vpicc"
