"""Stage timers + lightweight structured logging.

TPU equivalent of the reference's TRACE macro / wall-clock prints
(``include/ms/Debug.h:28-32``, ``pipeline/pipeline.sh:110``): per-stage
host timers that can be dumped as JSON, plus optional ``jax.profiler``
trace capture around a stage.
"""

from __future__ import annotations

import contextlib
import json
import os
import sys
import time
from dataclasses import dataclass, field


@dataclass
class StageTimer:
    stages: dict[str, float] = field(default_factory=dict)
    counters: dict[str, int] = field(default_factory=dict)
    verbose: bool = field(default_factory=lambda: bool(os.environ.get("MS_TPU_TRACE")))

    @contextlib.contextmanager
    def stage(self, name: str):
        start = time.perf_counter()
        try:
            yield
        finally:
            elapsed = time.perf_counter() - start
            self.stages[name] = self.stages.get(name, 0.0) + elapsed
            if self.verbose:
                print(f"[ms-tpu] {name}: {elapsed:.3f}s", file=sys.stderr)

    def count(self, name: str, value: int) -> None:
        self.counters[name] = value
        if self.verbose:
            print(f"[ms-tpu] {name} = {value}", file=sys.stderr)

    def dump(self) -> str:
        return json.dumps({"stages": self.stages, "counters": self.counters}, indent=2)


@contextlib.contextmanager
def jax_profile(outdir: str | None):
    """Capture a jax.profiler trace around a block when ``outdir`` is set."""
    if not outdir:
        yield
        return
    import jax

    jax.profiler.start_trace(outdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
