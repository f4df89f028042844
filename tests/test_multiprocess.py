"""Two-process jax.distributed smoke test (reference C20/C21: the torchrun
RANK/WORLD_SIZE convention + DDP semantics, exercised for real via
subprocesses on the CPU backend)."""

import os
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
sys.path.insert(0, os.environ["REPO"])
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
from imageclassification_tpu.config import TrainConfig
from imageclassification_tpu.parallel import (
    init_distributed_mode, make_mesh, make_global_batch, get_rank, get_world_size,
)
from imageclassification_tpu.utils.metrics import SmoothedValue

args = TrainConfig()
init_distributed_mode(args)
assert args.distributed and args.world_size == 2, (args.distributed, args.world_size)

mesh = make_mesh("")
assert mesh.shape["data"] == 4  # 2 procs x 2 local devices

rank = get_rank()
local = {
    "image": np.full((4, 2, 2, 3), rank, np.uint8),
    "label": np.full((4,), rank, np.int32),
}
batch = make_global_batch(mesh, local)
assert batch["label"].shape == (8,)

# global reduction: sum of labels = 4*0 + 4*1 = 4 on every process
import jax.numpy as jnp
total = jax.jit(lambda x: jnp.sum(x))(batch["label"])
assert int(total) == 4, int(total)

# metric sync (reference utils.py:80-88 all_reduce equivalent)
v = SmoothedValue()
v.update(float(rank + 1), n=2)  # rank0: 1.0x2, rank1: 2.0x2
v.synchronize_between_processes()
assert v.count == 4 and abs(v.global_avg - 1.5) < 1e-9, (v.count, v.global_avg)

# --- FSDP checkpoint round-trip across processes -----------------------------
# save_model must all-gather non-addressable shards BEFORE the rank-0 gate
# (collective on every process), and auto_load_model must broadcast the resume
# decision from process 0.
from jax.experimental import multihost_utils
from imageclassification_tpu.models import create_model
from imageclassification_tpu.optim.factory import create_optimizer
from imageclassification_tpu.engine.state import create_train_state
from imageclassification_tpu.parallel import shard_params
from imageclassification_tpu.checkpoint.io import (
    save_model, auto_load_model, wait_for_pending_saves,
)

model = create_model("resnet18", num_classes=3)
tx = create_optimizer("adamw", 1e-3, 0.05)
st = create_train_state(model, tx, jax.random.key(0), (1, 32, 32, 3))
st = shard_params(mesh, st, fsdp=True)
n_unaddressable = sum(
    1 for l in jax.tree_util.tree_leaves(st.params)
    if isinstance(l, jax.Array) and not l.is_fully_addressable
)
assert n_unaddressable > 0, "FSDP across 2 processes should shard some params"

args.output_dir = os.environ["CKPT_DIR"]
spec = {"name": "resnet18", "kwargs": {"num_classes": 3}}
save_model(args, (1, 32, 32, 3), 0, st, 3, spec)
wait_for_pending_saves()
multihost_utils.sync_global_devices("ckpt written")

args.auto_resume = True
args.resume = ""
st2, ck = auto_load_model(args, st)
assert ck is not None and ck["epoch"] == 0, ck and ck.get("epoch")
assert args.start_epoch == 1

# restored params are bit-identical to the saved (sharded) state: compare
# global fingerprints (st.params is non-addressable, so sum under jit gives
# the global value; st2.params came back as host numpy arrays)
fp_saved = float(jax.jit(
    lambda t: sum(jnp.sum(jnp.asarray(l, jnp.float32)) for l in jax.tree_util.tree_leaves(t))
)(st.params))
fp_loaded = float(sum(np.asarray(l, np.float64).sum() for l in jax.tree_util.tree_leaves(st2.params)))
assert abs(fp_saved - fp_loaded) < 1e-3 * max(1.0, abs(fp_saved)), (fp_saved, fp_loaded)

# ...and training CONTINUES under FSDP after the restart: reshard the loaded
# state and take one real optimizer step
from imageclassification_tpu.engine.step import build_train_step

st2 = shard_params(mesh, st2, fsdp=True)
cfg_step = TrainConfig(
    model="resnet18", input_size=32, batch_size=4, mixup=0.0, cutmix=0.0,
    smoothing=0.0, reprob=0.0, color_jitter=0.0, aa="", half_precision=False,
    fsdp=True,
)
lr_s = np.full(8, 1e-3, np.float32)
wd_s = np.full(8, 0.05, np.float32)
train_step = jax.jit(
    build_train_step(model, tx, cfg_step, 3, None, lr_s, wd_s),
    donate_argnums=(0,),
)
tb = make_global_batch(mesh, {
    "image": np.random.default_rng(rank).integers(0, 255, (4, 32, 32, 3)).astype(np.uint8),
    "label": np.full((4,), rank, np.int32),
})
st3, metrics = train_step(st2, tb, jax.random.key(5))
assert np.isfinite(float(metrics["loss"])), float(metrics["loss"])
fp_after = float(jax.jit(
    lambda t: sum(jnp.sum(jnp.asarray(l, jnp.float32)) for l in jax.tree_util.tree_leaves(t))
)(st3.params))
assert abs(fp_after - fp_saved) > 0, "post-resume step must move the params"

# --- sharded eval: global count equals dataset size exactly ------------------
# eval_batches shards the val set into disjoint per-process slices; summing
# the device-side valid-label counts over all steps must give n_samples once
# (the reference double-counts: every rank evaluates the full set).
from imageclassification_tpu.data.sampler import eval_batches

n_samples, local_bs = 23, 4
ev_batches = eval_batches(n_samples, local_bs, rank=rank, world=2)
count = jax.jit(lambda l: (l >= 0).sum())
tot = 0
for idx in ev_batches:
    gb = make_global_batch(mesh, {"label": idx.astype(np.int32)})
    tot += int(count(gb["label"]))
assert tot == n_samples, (tot, n_samples)

# --- any_process: collective-safe flag reduction (preemption path) -----------
# only rank 1 "receives the signal"; both processes must agree the answer is
# True (and agree on False when no one did)
from imageclassification_tpu.parallel import any_process

assert any_process(False) is False
assert any_process(rank == 1) is True

# rank-0 print gating is active after init_distributed_mode (utils.py:288-300
# semantics) — force=True bypasses it, which this also regression-tests
print(f"RANK{rank} OK", flush=True, force=True)
"""


@pytest.mark.slow
def test_two_process_data_parallel(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    procs = []
    for rank in range(2):
        env = dict(os.environ)
        env.update(
            RANK=str(rank),
            WORLD_SIZE="2",
            MASTER_ADDR="127.0.0.1",
            MASTER_PORT="29876",
            REPO=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            CKPT_DIR=str(tmp_path / "ckpt"),
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
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
        assert f"RANK{rank} OK" in out
