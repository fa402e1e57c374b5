"""Persistent AOT executable cache — the compile-once-ever layer.

The axon TPU plugin compiles server-side, so JAX's own persistent
compilation cache (``JAX_COMPILATION_CACHE_DIR``) never stores anything
on this backend (verified: no cache directory is ever created, and a
same-shape recompile in a fresh process pays the full server compile
again — BASELINE.md round 3).  ``jax.experimental.serialize_executable``
*does* round-trip on axon, so this module supplies the missing
persistence: compiled executables are serialized to disk keyed by
(cache version, jax version, backend/device kind, x64 mode, the calling
module's source hash, argument shapes/dtypes, static kwargs), and any
process that asks for the same jit at the same shapes loads the blob
instead of compiling.

This is the round-3 answer to the measured compile cliff (VERDICT r2
item 1b): a (256, 16384)-read mapping jit costs minutes of server
compile per process without it, and one ~second load with it.

The cache NEVER affects results: every path falls back to the plain
jit call on any error, and keys include the source hash of the function
module so editing a kernel invalidates its blobs automatically.
"""

from __future__ import annotations

import hashlib
import os
import pickle
import tempfile
from pathlib import Path

_STATS = {"hits": 0, "misses": 0, "errors": 0, "disabled": 0,
          "memo_hits": 0}
# in-process memo of loaded/compiled executables: deserialize_and_load
# costs ~0.5 s per call on the tunnel backend, so repeated batches must
# not re-load the blob from disk (measured: 58 re-loads added ~30 s to
# a 7.7k-read mapping pass)
_MEMO: dict[str, object] = {}


def cache_stats() -> dict:
    """Counters for observability (StageTimer dumps + tests)."""
    return dict(_STATS)


def reset_cache_stats() -> None:
    for k in _STATS:
        _STATS[k] = 0


def cache_dir() -> Path:
    d = os.environ.get("MS_TPU_AOT_CACHE")
    if d:
        return Path(d)
    return Path.home() / ".cache" / "muchsalsa_tpu" / "aot"


def cache_enabled() -> bool:
    """On by default for accelerator backends only: CPU compiles are
    seconds (nothing to save) and XLA:CPU AOT blobs are machine-feature
    pinned (SIGILL risk if the cache dir moves hosts).  An explicit
    ``MS_TPU_AOT_CACHE=<dir>`` opts in anywhere (tests); ``=0``
    disables everywhere."""
    env = os.environ.get("MS_TPU_AOT_CACHE")
    if env == "0":
        return False
    if env:
        return True
    try:
        import jax

        return jax.devices()[0].platform != "cpu"
    except Exception:
        return False


_CACHE_VERSION = 1
_SRC_HASHES: dict[str, str] = {}
_TREE_HASH: str | None = None


def _kernel_tree_hash() -> str:
    """Combined hash of every compute-path source file (``ops/`` +
    ``utils/`` + ``parallel/``): a cached executable bakes in every
    transitively-traced module, not just the entry function's, so the
    key must change when ANY of them is edited (ADVICE r3)."""
    global _TREE_HASH
    if _TREE_HASH is not None:
        return _TREE_HASH
    h = hashlib.sha256()
    try:
        pkg_root = Path(__file__).resolve().parent.parent
        for sub in ("ops", "utils", "parallel"):
            d = pkg_root / sub
            if not d.is_dir():
                continue
            for f in sorted(d.glob("*.py")):
                h.update(f.name.encode())
                h.update(f.read_bytes())
        _TREE_HASH = h.hexdigest()[:16]
    except Exception:
        _TREE_HASH = "notree"
    return _TREE_HASH


def _source_hash(fn) -> str:
    """Hash of the module source defining ``fn`` combined with the
    kernel-tree hash — editing the entry module OR any transitively
    traced compute module invalidates its cached executables."""
    mod = getattr(fn, "__module__", "") or ""
    cached = _SRC_HASHES.get(mod)
    if cached is not None:
        return cached
    import importlib

    try:
        src = Path(importlib.import_module(mod).__file__).read_bytes()
        h = hashlib.sha256(src).hexdigest()[:16]
    except Exception:
        h = "nosrc"
    h = f"{h}.{_kernel_tree_hash()}"
    _SRC_HASHES[mod] = h
    return h


def _abstract_sig(args) -> str:
    import jax

    leaves = jax.tree_util.tree_leaves(args)
    parts = []
    for leaf in leaves:
        shape = getattr(leaf, "shape", ())
        dtype = getattr(leaf, "dtype", type(leaf).__name__)
        parts.append(f"{dtype}{tuple(shape)}")
    return ";".join(parts)


def _cache_key(fn, args, static_kwargs) -> str:
    import jax

    dev = jax.devices()[0]
    material = "|".join(
        [
            f"v{_CACHE_VERSION}",
            jax.__version__,
            f"{dev.platform}:{getattr(dev, 'device_kind', '?')}:{len(jax.devices())}",
            f"x64={jax.config.jax_enable_x64}",
            f"{getattr(fn, '__module__', '')}.{getattr(fn, '__name__', repr(fn))}",
            _source_hash(fn),
            _abstract_sig(args),
            repr(sorted(static_kwargs.items())),
        ]
    )
    return hashlib.sha256(material.encode()).hexdigest()[:32]


def cached_compile(jit_fn, args: tuple, static_kwargs: dict):
    """Return an executable for ``jit_fn`` at ``args``' shapes, loading
    a previously serialized one when available, else compiling and
    persisting.  Returns None when caching is unavailable (caller then
    invokes the plain jit — results are identical either way)."""
    if not cache_enabled():
        _STATS["disabled"] += 1
        return None
    try:
        from jax.experimental.serialize_executable import (
            deserialize_and_load, serialize)

        key = _cache_key(jit_fn, args, static_kwargs)
        memo = _MEMO.get(key)
        if memo is not None:
            _STATS["memo_hits"] += 1
            return memo
        path = cache_dir() / f"{key}.pkl"
        if path.is_file():
            with open(path, "rb") as fh:
                blob, in_tree, out_tree = pickle.load(fh)
            loaded = deserialize_and_load(blob, in_tree, out_tree)
            _STATS["hits"] += 1
            _MEMO[key] = loaded
            return loaded
        compiled = jit_fn.lower(*args, **static_kwargs).compile()
        _MEMO[key] = compiled
        try:
            blob, in_tree, out_tree = serialize(compiled)
            path.parent.mkdir(parents=True, exist_ok=True)
            fd, tmp = tempfile.mkstemp(dir=path.parent, suffix=".tmp")
            with os.fdopen(fd, "wb") as fh:
                pickle.dump((blob, in_tree, out_tree), fh)
            os.replace(tmp, path)  # atomic publish vs concurrent writers
        except Exception:
            _STATS["errors"] += 1
        _STATS["misses"] += 1
        return compiled
    except Exception:
        _STATS["errors"] += 1
        return None


_EXEC_WARNED: set = set()


def cached_call(jit_fn, args: tuple, static_kwargs: dict):
    """Invoke ``jit_fn(*args, **static_kwargs)`` through the executable
    cache, falling back to the plain jit call on any cache failure.

    Execution failures of a loaded executable (as opposed to cache
    load/compile failures) are logged loudly before the fallback — a
    genuine runtime error (OOM, sharding mismatch) would otherwise hide
    behind a silent minutes-long recompile (ADVICE r3)."""
    exe = cached_compile(jit_fn, args, static_kwargs)
    if exe is None:
        return jit_fn(*args, **static_kwargs)
    try:
        return exe(*args)
    except Exception as exc:
        _STATS["errors"] += 1
        name = f"{getattr(jit_fn, '__module__', '')}." \
               f"{getattr(jit_fn, '__name__', repr(jit_fn))}"
        if name not in _EXEC_WARNED:
            _EXEC_WARNED.add(name)
            import sys

            print(
                f"[aot_cache] cached executable for {name} FAILED at run "
                f"time ({type(exc).__name__}: {exc}); falling back to a "
                f"fresh jit (may recompile for minutes)",
                file=sys.stderr, flush=True)
        return jit_fn(*args, **static_kwargs)
