"""Checkpoint save/resume (reference C16/C17: utils.py:536-615).

CLI-visible behavior preserved:
  * files named `checkpoint-{N|best|best-ema}.pth` under the output dir
    (utils.py:540), rolling deletion of checkpoints older than
    save_ckpt_num*save_ckpt_freq (utils.py:554-558), rank-0-only writes;
  * auto-resume scans for the max numeric epoch (utils.py:563-573);
  * transfer-learning load prunes keys that mismatch by NAME or SHAPE, printing
    `Skipping mismatched key: <k>` per drop (utils.py:584-595);
  * optimizer/epoch/EMA state restored ONLY when every key matched
    (missing_nums == 0, utils.py:605-614); best/best-ema resumable only for
    --eval; EMA re-seeded from the model when absent (utils.py:599-603).

Payload: instead of pickling a live nn.Module (reference README.md:12), we
store flattened numpy pytrees + a model spec (name + ctor kwargs), which gives
the same "checkpoint knows its own architecture" UX (val.py rebuilds the model
without the user naming it, val.py:14-28) without arbitrary-code-execution
pickles.
"""

from __future__ import annotations

import glob
import os
import pickle
import threading
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

from ..parallel.dist import is_main_process

FORMAT_VERSION = 1


def _key_str(p) -> str:
    # DictKey(.key) / SequenceKey(.idx) / GetAttrKey(.name) / FlattenedIndexKey(.key)
    for attr in ("key", "idx", "name"):
        if hasattr(p, attr):
            return str(getattr(p, attr))
    return str(p)


def _flatten(tree) -> Dict[str, np.ndarray]:
    # one device_get for the whole pytree — per-leaf transfers cost minutes
    # over tunneled backends
    tree = jax.device_get(tree)
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    out = {}
    for path, leaf in flat:
        key = "/".join(_key_str(p) for p in path)
        out[key] = np.asarray(leaf)
    return out


def _shape_map(tree) -> Dict[str, tuple]:
    """Flat key → leaf shape, without any device transfer (works on
    non-addressable multi-host shards, where device_get would raise)."""
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {
        "/".join(_key_str(p) for p in path): tuple(np.shape(leaf))
        for path, leaf in flat
    }


def _gather_replicated(tree):
    """Reshard non-fully-addressable leaves (FSDP across hosts) to replicated
    so a host snapshot is possible. COLLECTIVE: every process must call this
    with the same tree. No-op on single-host / pure-DP state."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    idx = [
        i for i, l in enumerate(leaves)
        if isinstance(l, jax.Array) and not l.is_fully_addressable
    ]
    if not idx:
        return tree
    rep = jax.sharding.NamedSharding(
        leaves[idx[0]].sharding.mesh, jax.sharding.PartitionSpec()
    )
    sub = tuple(leaves[i] for i in idx)
    gathered = jax.jit(lambda xs: xs, out_shardings=(rep,) * len(sub))(sub)
    for i, g in zip(idx, gathered):
        leaves[i] = g
    return jax.tree_util.tree_unflatten(treedef, leaves)


def _unflatten_like(template, flat: Dict[str, np.ndarray]):
    """Rebuild a pytree shaped like `template` from a flat dict; leaves missing
    from `flat` keep the template's value."""
    paths, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for path, leaf in paths:
        key = "/".join(_key_str(p) for p in path)
        leaves.append(flat.get(key, leaf))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_model(
    args,
    input_shape,
    epoch,
    state,
    num_classes: int,
    model_spec: Dict[str, Any],
):
    """Write checkpoint-{epoch}.pth (reference utils.py:536-558)."""
    epoch_name = str(epoch)
    output_dir = Path(args.output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    checkpoint_path = output_dir / f"checkpoint-{epoch_name}.pth"

    # Collective phase first: with multi-host FSDP the shards are not fully
    # addressable, so EVERY process joins the all-gathers (same order on
    # every process). Gather → host-snapshot → free ONE tree at a time: the
    # whole point of --fsdp is that params+optimizer+EMA do not fit
    # replicated, so materializing all gathered trees simultaneously would
    # OOM exactly when sharding matters.
    tree_specs = [
        ("model", state.params),
        ("batch_stats", state.batch_stats),
        ("optimizer", state.opt_state),
    ]
    if state.ema_params is not None:
        tree_specs.append(("model_ema", state.ema_params))
        if state.ema_batch_stats is not None:
            tree_specs.append(("model_ema_batch_stats", state.ema_batch_stats))

    main = is_main_process()
    snaps: Dict[str, Dict[str, np.ndarray]] = {}
    for name, tree in tree_specs:
        gathered = _gather_replicated(tree)
        if main:
            snaps[name] = _flatten(gathered)  # device→host copy
        del gathered  # free the replicated device copy before the next gather

    if not main:
        return

    to_save = {
        "format_version": FORMAT_VERSION,
        "model_spec": model_spec,          # {'name':..., 'kwargs':...}
        "step": int(state.step),
        "epoch": epoch,
        "input_shape": list(input_shape),
        "num_classes": num_classes,
        "args": args.to_dict() if hasattr(args, "to_dict") else vars(args),
    }
    to_save.update(snaps)

    # device→host snapshot happened above (donation invalidates the live
    # buffers at the next step, so _flatten must be synchronous); only the
    # serialize+write goes to a background thread so training resumes
    # immediately
    def _write():
        tmp = str(checkpoint_path) + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump(to_save, f, protocol=pickle.HIGHEST_PROTOCOL)
        os.replace(tmp, checkpoint_path)
        # rolling retention (reference utils.py:554-558)
        if isinstance(epoch, int):
            to_del = epoch - args.save_ckpt_num * args.save_ckpt_freq
            old_ckpt = output_dir / f"checkpoint-{to_del}.pth"
            if old_ckpt.exists():
                os.remove(old_ckpt)

    wait_for_pending_saves()
    t = threading.Thread(target=_write, daemon=True)
    t.start()
    _PENDING_SAVES.append(t)


_PENDING_SAVES: list = []


def wait_for_pending_saves() -> None:
    """Join outstanding async checkpoint writes (called before reads and at
    the start of each save so at most one write is in flight)."""
    while _PENDING_SAVES:
        _PENDING_SAVES.pop().join()


def load_checkpoint(path: str, dequantize: bool = True) -> Dict[str, Any]:
    """Load a checkpoint dict. `dequantize=True` (the default, used by every
    training/resume path) restores fp32 weights from int8 storage;
    `dequantize=False` keeps int8 kernels + quant metadata for the quantized
    inference path (ops/int8.py, val.py)."""
    wait_for_pending_saves()
    with open(path, "rb") as f:
        ck = pickle.load(f)
    return _dequantize_weights(ck) if dequantize else ck


def _dequantize_weights(ck: Dict[str, Any]) -> Dict[str, Any]:
    """Restore fp32 kernels from a weight-only int8 checkpoint
    (modelchange.dynamic_quantize_model stores per-output-channel absmax
    scales under 'quant_scales'). Without this every loader would silently
    use raw -127..127 int8 values as weights."""
    scales = ck.get("quant_scales")
    if not scales or not isinstance(ck.get("model"), dict):
        return ck
    model = dict(ck["model"])
    for k, s in scales.items():
        if k not in model:
            continue
        arr = np.asarray(model[k], np.float32)
        model[k] = (arr.reshape(-1, arr.shape[-1]) * np.asarray(s)).reshape(
            arr.shape
        ).astype(np.float32)
    ck["model"] = model
    print(
        f"Dequantized {len(scales)} {ck.get('quant_dtype', 'int8')} kernels"
    )
    # The dict is now fp32; drop the quantization metadata so a tool that
    # loads and re-pickles this checkpoint (e.g. convert_model_ema_to_model)
    # cannot produce a file whose stale scales get re-applied to already-
    # dequantized weights on the next load (silent corruption).
    ck.pop("quant_scales", None)
    ck.pop("quant_dtype", None)
    return ck


def load_params_with_pruning(
    params, ckpt_flat: Dict[str, np.ndarray], verbose: bool = True
) -> Tuple[Any, int]:
    """Keep only keys matching by name AND shape; returns (params, missing_nums).
    Prints `Skipping mismatched key: <k>` per drop (reference utils.py:584-595)."""
    current = _shape_map(params)  # shape-only: no device transfer needed
    kept = {}
    missing_nums = 0
    for k, v in ckpt_flat.items():
        if k in current and tuple(v.shape) == current[k]:
            kept[k] = v
        else:
            if verbose:
                print(f"Skipping mismatched key: {k}")
            missing_nums += 1
    return _unflatten_like(params, kept), missing_nums


def derive_prune_masks(params) -> Tuple[Any, float]:
    """Capture the zero pattern of pruned kernels for --prune_mask sparse
    fine-tuning. Eligibility mirrors modelchange.prune_model (flat key ends
    with 'kernel', ndim>=2, >4096 elements); every other leaf maps to a
    scalar True so the in-step mask apply folds to a no-op for it.
    Returns (mask_pytree, sparsity_over_eligible)."""
    host = jax.device_get(params)  # one transfer for the whole tree
    paths, treedef = jax.tree_util.tree_flatten_with_path(host)
    masks, total, kept = [], 0, 0
    for path, leaf in paths:
        key = "/".join(_key_str(p) for p in path)
        arr = np.asarray(leaf)
        if (key.endswith("kernel") and arr.ndim >= 2 and arr.size > 4096
                and not key.endswith("head/kernel")):  # prune_model never
            # prunes classifier Linears (head/pre_head); don't freeze their
            # (zero-init) entries either
            m = arr != 0
            masks.append(m)
            total += m.size
            kept += int(m.sum())
        else:
            masks.append(True)
    tree = jax.tree_util.tree_unflatten(treedef, masks)
    sparsity = 0.0 if total == 0 else 1.0 - kept / total
    return tree, sparsity


def find_latest_checkpoint(output_dir: str) -> Optional[str]:
    """Max numeric epoch among checkpoint-*.pth (reference utils.py:563-573)."""
    wait_for_pending_saves()
    all_checkpoints = glob.glob(os.path.join(output_dir, "checkpoint-*.pth"))
    latest = -1
    for ckpt in all_checkpoints:
        t = ckpt.split("-")[-1].split(".")[0]
        if t.isdigit():
            latest = max(int(t), latest)
    if latest >= 0:
        return os.path.join(output_dir, f"checkpoint-{latest}.pth")
    return None


def _sync_resume_across_processes(args) -> None:
    """Make the resume decision on process 0 authoritative everywhere.

    The reference relies on every DDP rank independently finding the same
    checkpoint file; on multi-host pods without a shared filesystem only rank
    0 may see it, and (unlike torch DDP) nothing later broadcasts parameters —
    replicas would silently diverge. Broadcasting the resolved path turns that
    into either a consistent resume or a loud, immediate error."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    enc = np.zeros(1024, np.uint8)
    raw = args.resume.encode()
    if len(raw) > enc.size:
        raise ValueError(f"resume path too long to broadcast: {args.resume!r}")
    enc[: len(raw)] = np.frombuffer(raw, np.uint8)
    out = np.asarray(multihost_utils.broadcast_one_to_all(enc))
    resume = bytes(out).rstrip(b"\x00").decode()
    if resume != args.resume:
        print(
            f"process {jax.process_index()}: adopting process 0 resume "
            f"decision {resume!r} (local was {args.resume!r})",
            flush=True,
        )
        args.resume = resume
    if resume and not os.path.exists(resume):
        raise FileNotFoundError(
            f"process {jax.process_index()} cannot read {resume!r} — "
            "multi-host resume requires the checkpoint on a shared "
            "filesystem (or mirrored to every host)"
        )


def _assert_checkpoint_consistent(ckpt_flat: Dict[str, np.ndarray]) -> None:
    """Every process loaded its own copy of the file; verify the copies agree
    (a cheap content fingerprint, allgathered)."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    # NaN-safe fingerprint: a single non-finite value in the checkpoint must
    # not poison the sum (NaN != NaN would flag identical copies as
    # divergent) — sum the finite part and count non-finites separately
    fp = 0.0
    n_nonfinite = 0.0
    for v in ckpt_flat.values():
        arr = np.asarray(v, np.float64)
        finite = np.isfinite(arr)
        fp += float(arr[finite].sum())
        n_nonfinite += float(arr.size - finite.sum())
    fps = np.asarray(
        multihost_utils.process_allgather(
            np.asarray([fp, n_nonfinite], np.float32)
        )
    ).reshape(-1, 2)
    if not np.allclose(fps, fps[0], rtol=1e-5, atol=1e-6):
        raise RuntimeError(
            f"checkpoint content differs across processes (fingerprints "
            f"{fps.tolist()}) — replicas would diverge; ensure every host "
            "sees the same checkpoint file"
        )


def auto_load_model(args, state, model_spec=None):
    """Resume/transfer-load into `state` (reference utils.py:561-615 semantics).
    Returns (state, loaded_checkpoint_dict_or_None). Mutates args.start_epoch /
    args.resume exactly as the reference does."""
    if args.auto_resume and len(args.resume) == 0:
        latest = find_latest_checkpoint(args.output_dir)
        if latest is not None:
            args.resume = latest
        print("Auto resume checkpoint: %s" % args.resume)

    _sync_resume_across_processes(args)
    if not args.resume:
        return state, None

    if args.resume.startswith("http"):
        # reference supports URL resume via torch.hub (utils.py:576-578);
        # TPU pods are zero-egress, so fetch is attempted but a clean error
        # points at --pretrained_path with a local file.
        import urllib.request

        local = os.path.join(args.output_dir, os.path.basename(args.resume))
        try:
            urllib.request.urlretrieve(args.resume, local)
            args.resume = local
        except Exception as e:
            raise RuntimeError(
                f"cannot download {args.resume} ({e}); copy the checkpoint "
                "to local disk and pass it via --resume/--pretrained_path"
            ) from e

    print(args.resume)
    checkpoint = load_checkpoint(args.resume)
    _assert_checkpoint_consistent(checkpoint["model"])

    new_params, missing_nums = load_params_with_pruning(
        state.params, checkpoint["model"]
    )
    state = state.replace(params=new_params)
    if checkpoint.get("batch_stats") and state.batch_stats:
        new_stats, _ = load_params_with_pruning(
            state.batch_stats, checkpoint["batch_stats"], verbose=False
        )
        state = state.replace(batch_stats=new_stats)
    print("Resume checkpoint %s" % args.resume)

    if args.model_ema and state.ema_params is not None:
        if "model_ema" in checkpoint and missing_nums == 0:
            ema, _ = load_params_with_pruning(
                state.ema_params, checkpoint["model_ema"], verbose=False
            )
            state = state.replace(ema_params=ema)
            if state.ema_batch_stats is not None and checkpoint.get("model_ema_batch_stats"):
                ebs, _ = load_params_with_pruning(
                    state.ema_batch_stats,
                    checkpoint["model_ema_batch_stats"], verbose=False,
                )
                state = state.replace(ema_batch_stats=ebs)
        else:
            # re-seed EMA from the (possibly pruned-loaded) model; real copy —
            # aliased buffers would break train-state donation
            state = state.replace(
                ema_params=jax.tree.map(jax.numpy.copy, state.params)
            )
            if state.ema_batch_stats is not None:
                state = state.replace(
                    ema_batch_stats=jax.tree.map(jax.numpy.copy, state.batch_stats)
                )

    if "optimizer" in checkpoint and "epoch" in checkpoint and missing_nums == 0:
        opt, _ = load_params_with_pruning(
            state.opt_state, checkpoint["optimizer"], verbose=False
        )
        state = state.replace(opt_state=opt)
        if "step" in checkpoint:
            state = state.replace(
                step=jax.numpy.asarray(checkpoint["step"], jax.numpy.int32)
            )
        if not isinstance(checkpoint["epoch"], str):
            args.start_epoch = checkpoint["epoch"] + 1
        else:
            assert args.eval, "Does not support resuming with checkpoint-best"
        print("With optim & sched!")
    return state, checkpoint
