#!/usr/bin/env bash
# Build the reference muchsalsa binary offline with g++-12 against the vendored
# GSL shim (third_party/gsl_shim). Bypasses the reference CMake, whose
# FetchContent needs network (libms/CMakeLists.txt:6-16).
set -euo pipefail
REF=/root/reference
OUT=${1:-/root/repo/build_ref}
mkdir -p "$OUT/obj"
CXX=${CXX:-g++}
FLAGS=(-std=c++20 -O2 -pthread -w
  -I"$REF/include/ms" -I"$REF/include" -I"$REF/src" -I/root/repo/third_party/gsl_shim)

# libstdc++ rejects std::deque<T* const> (valid under libc++): patch the one
# affected TU into the build dir. Patched sources are build artifacts, never
# committed (build_ref/ is gitignored).
mkdir -p "$OUT/patched"
for f in "$REF/libms/src/kernel/cc.cpp" "$REF/src/main.cpp"; do
  sed 's/const \*const>/const *>/g' "$f" > "$OUT/patched/$(basename "$f")"
done

srcs=$(find "$REF/libms/src" "$REF/src" -name '*.cpp' ! -name 'cc.cpp' ! -name 'main.cpp' | sort)
srcs="$srcs $OUT/patched/cc.cpp $OUT/patched/main.cpp"
objs=()
for s in $srcs; do
  o="$OUT/obj/$(echo "${s#$REF/}" | tr '/' '_').o"
  objs+=("$o")
  if [ ! -f "$o" ] || [ "$s" -nt "$o" ]; then
    echo "CXX $s"
    "$CXX" "${FLAGS[@]}" -c "$s" -o "$o" &
    while [ "$(jobs -r | wc -l)" -ge "$(nproc)" ]; do wait -n; done
  fi
done
wait
echo "LINK $OUT/muchsalsa"
"$CXX" "${FLAGS[@]}" "${objs[@]}" -o "$OUT/muchsalsa"
echo OK
