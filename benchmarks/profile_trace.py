"""Per-op TPU time breakdown of the train step via jax.profiler.

Captures a device trace of K chained train steps and aggregates TPU-side op
durations from the Chrome-trace export (pure-stdlib parse — no tensorboard
needed). This is the instrument BREAKDOWN.md's 'where does bwd time go'
question needs.

Run:  python benchmarks/profile_trace.py            # resnet50, batch 128
      BENCH_MODEL=convnext_tiny python benchmarks/profile_trace.py

Writes benchmarks/trace_ops_<model>.json (top ops by total device time).
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import re
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

K = 8


def capture(model_name: str, batch: int):
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/imgcls_tpu_xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from bench import _build  # reuse the bench step builder

    step_fn, fresh_state, data = _build(batch, model_name=model_name)

    def scanned(state, data):
        def body(st, _):
            st, metrics = step_fn(st, data, jax.random.key(1))
            # keep all metrics live — returning only the loss lets XLA
            # DCE the metric computations incl. exact-mode's second forward
            return st, metrics
        return jax.lax.scan(body, state, None, length=K)[1]

    f = jax.jit(scanned)
    np.asarray(f(fresh_state(), data)["loss"])  # compile+warm OUTSIDE the trace

    tmp = tempfile.mkdtemp(prefix="jax_trace_")
    jax.profiler.start_trace(tmp)
    np.asarray(f(fresh_state(), data)["loss"])
    jax.profiler.stop_trace()
    return tmp


def parse(trace_dir: str):
    files = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    assert files, f"no trace json under {trace_dir}"
    d = json.load(gzip.open(files[0]))
    ev = d["traceEvents"]
    # aggregate ONLY the 'XLA Ops' lane — leaf device ops; other lanes
    # ('Steps', 'XLA Modules', host python) nest/duplicate the same time
    op_lanes = {
        (e["pid"], e["tid"]) for e in ev
        if e.get("ph") == "M" and e.get("name") == "thread_name"
        and e.get("args", {}).get("name") == "XLA Ops"
    }
    agg = collections.Counter()
    counts = collections.Counter()
    total = 0.0
    for e in ev:
        if e.get("ph") == "X" and (e.get("pid"), e.get("tid")) in op_lanes:
            # strip per-instance suffixes: 'fusion.123' → 'fusion'
            name = re.sub(r"[.(].*$", "", e.get("name", ""))
            if name in ("while", "jit_scanned"):
                continue  # control-flow wrappers re-span their body ops
            dur = e.get("dur", 0)
            agg[name] += dur
            counts[name] += 1
            total += dur
    return agg, counts, total


def main():
    model_name = os.environ.get("BENCH_MODEL", "resnet50")
    batch = int(os.environ.get("BENCH_BATCH", "128"))
    trace_dir = capture(model_name, batch)
    agg, counts, total = parse(trace_dir)

    rows = []
    print(f"\n{model_name} batch={batch}: device total {total / 1e3 / K:.2f} "
          f"ms/step over {K} steps")
    for name, dur in agg.most_common(30):
        pct = 100.0 * dur / max(total, 1)
        row = {
            "op": name,
            "ms_per_step": round(dur / 1e3 / K, 3),
            "pct": round(pct, 1),
            "count": counts[name],
        }
        rows.append(row)
        print(f"{dur / 1e3 / K:9.3f} ms  {pct:5.1f}%  x{counts[name]:<5d} {name}")

    out = Path(__file__).parent / f"trace_ops_{model_name}.json"
    out.write_text(json.dumps(
        {"model": model_name, "batch": batch, "k_steps": K,
         "device_ms_per_step": round(total / 1e3 / K, 3), "ops": rows},
        indent=2,
    ))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
