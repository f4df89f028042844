"""Swin window-attention layout matchups (round 5).

The round-5 chip receipts localize Swin-T's 11% MFU precisely:
  - trace_ops_swin_tiny.json: copy 55.4 ms (24.6%) + reshape 14.5 ms (6.4%)
    of the 225 ms step are pure layout movement (window partition/reverse,
    qkv head-split transposes, rolls);
  - swin_bench.json: the attention core runs 3-5x above its minimum-traffic
    bound because every [B·nW, h, 49, 49] / [.., 49, 32] tensor pads its
    lane dim to 128 (49→128: 2.6x, 32→128: 4x traffic).

This instrument measures four functionally-identical SwinBlock layouts on
the real stage geometries (each golden-checked against the model's
SwinBlock in float32 before timing):

  v0  model SwinBlock (models/swin.py) — the baseline the trace profiled
  v1  fused-partition: qkv Dense applied in NHWC BEFORE windowing, ONE
      combined partition+head-split transpose (instead of partition copy +
      5-d qkv transpose), proj applied AFTER the reverse in NHWC
  v2  v1 + bias/mask folded INTO the q·k dot via augmented contraction
      dims (q gains a within-window one-hot, k gains the bias column +
      region one-hots; padded lanes are free: 32→128 already) — deletes
      every broadcast-add stream over the big attention tensor
  v3  v2 + G windows merged per attention group ([G·49, G·49] dots with
      the window separation folded into the same augmentation): fewer,
      larger attention tiles → less padded attn-matrix traffic, G× more
      MXU flops (MXU is at 1-2% here, so flops are free)

Writes benchmarks/swin_layout_bench.json. Verdict wiring: a winning layout
becomes models/swin.py's default (golden tests keep timm parity).
Reference anchor: timm swin via /root/reference/train.py:194.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

B = int(os.environ.get("SWIN_B", "128"))
K_LO = int(os.environ.get("SWIN_K_LO", "8"))
K_HI = int(os.environ.get("SWIN_K_HI", "40"))

# swin_tiny stage geometry at 224²: (H, C, heads)
STAGES = [(56, 96, 3), (28, 192, 6), (14, 384, 12), (7, 768, 24)]
W = 7
N = W * W


def _scan_time(body, carry0, label):
    import jax

    times = {}
    for K in (K_LO, K_HI):
        scanned = jax.jit(functools.partial(
            lambda c, K: jax.lax.scan(body, c, None, length=K), K=K))
        np.asarray(jax.tree.leaves(scanned(carry0)[1])[0])
        best = float("inf")
        for rep in range(3):
            c = jax.tree.map(
                lambda a: a + np.asarray(1e-3 * (rep + 1), a.dtype), carry0)
            t0 = time.perf_counter()
            np.asarray(jax.tree.leaves(scanned(c)[1])[0])
            best = min(best, time.perf_counter() - t0)
        times[K] = best
    per = (times[K_HI] - times[K_LO]) / (K_HI - K_LO)
    print(f"{label:52s} {per * 1e3:9.4f} ms", flush=True)
    return per


# ---------------------------------------------------------------------------
# building blocks shared by the rewrites (flax-semantics: stats in f32,
# matmuls in the compute dtype)
# ---------------------------------------------------------------------------

def _ln(x, p, eps=1e-5):
    import jax
    import jax.numpy as jnp

    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = (xf * xf).mean(-1, keepdims=True) - mu * mu
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"] + p["bias"]).astype(x.dtype)


def _dense(x, p):
    return x @ p["kernel"].astype(x.dtype) + p["bias"].astype(x.dtype)


def _mlp(p, x):
    import jax

    h = _dense(x, p["Dense_0"])
    h = jax.nn.gelu(h, approximate=False)
    return _dense(h, p["Dense_1"])


def _bias_nm(params, dtype):
    """[h, N, N] relative-position bias from the table (one-hot matmul)."""
    import jax.numpy as jnp

    from imageclassification_tpu.models.swin import _relative_position_onehot

    table = params["attn"]["relative_position_bias_table"]
    onehot = jnp.asarray(_relative_position_onehot(W), dtype)
    return (onehot @ table.astype(dtype)).reshape(N, N, -1).transpose(2, 0, 1)


def _to_windows(t, G, nWh, heads, hd):
    """[B,H,H,3C] → [3, B, nW/G, h, G·N, hd] in ONE transpose. Groups are
    G horizontally-adjacent windows; tokens row-major within each window."""
    Bv = t.shape[0]
    t = t.reshape(Bv, nWh, W, nWh // G, G, W, 3, heads, hd)
    t = t.transpose(6, 0, 1, 3, 7, 4, 2, 5, 8)
    return t.reshape(3, Bv, nWh * nWh // G, heads, G * N, hd)


def _from_windows(o, G, nWh, heads, hd):
    """[B, nW/G, h, G·N, hd] → [B,H,H,C] in ONE transpose (inverse)."""
    Bv = o.shape[0]
    o = o.reshape(Bv, nWh, nWh // G, heads, G, W, W, hd)
    o = o.transpose(0, 1, 5, 2, 4, 6, 3, 7)
    return o.reshape(Bv, nWh * W, nWh * W, heads * hd)


def _regions_per_window(H, shift):
    """[nW, N] shifted-window region id (0..8) per token — static."""
    img = np.zeros((H, H), np.int32)
    cnt = 0
    for hs in (slice(0, -W), slice(-W, -shift), slice(-shift, None)):
        for ws in (slice(0, -W), slice(-W, -shift), slice(-shift, None)):
            img[hs, ws] = cnt
            cnt += 1
    return (img.reshape(H // W, W, H // W, W)
            .transpose(0, 2, 1, 3).reshape(-1, N))


def _static_augments(H, shift, G):
    """Static (param-free) augmentation blocks for the q·k fold.

    Concat order (must pair between q and k):
      q: [ q·scale | eye_N tile | 10·onehot_G | 10·onehot9(region) | 1    ]
      k: [ k       | bias column| 10·onehot_G | 10·onehot9(region) | -pen ]
    so the dot adds bias[i%N, j%N] + 100·δ_window + 100·δ_region − pen,
    i.e. 0 for an allowed pair and ≤ −100 for a blocked one (v0's −100
    semantics; cross-window bias leakage lands on blocked pairs only).

    Returns (aq, ak_static): [nW/G, G·N, Dq], [nW/G, G·N, Dq−N] float32.
    """
    nW = (H // W) ** 2
    eye_tile = np.tile(np.eye(N, dtype=np.float32), (G, 1))   # [GN, N]
    q_parts, k_parts = [], []
    pen = 0.0
    if G > 1:
        g_oh = 10.0 * np.repeat(np.eye(G, dtype=np.float32), N, axis=0)
        q_parts.append(g_oh)
        k_parts.append(g_oh)
        pen += 100.0
    if shift:
        r_oh = np.eye(9, dtype=np.float32)[_regions_per_window(H, shift)]
        r_grp = 10.0 * r_oh.reshape(nW // G, G * N, 9)        # [nW/G, GN, 9]
        q_parts.append(r_grp)
        k_parts.append(r_grp)
        pen += 100.0
    if pen:
        q_parts.append(np.ones((G * N, 1), np.float32))
        k_parts.append(np.full((G * N, 1), -pen, np.float32))

    def stack(parts):
        if not parts:
            return np.zeros((nW // G, G * N, 0), np.float32)
        return np.concatenate(
            [np.broadcast_to(p, (nW // G,) + p.shape[-2:]) for p in parts],
            -1)

    aq = stack([eye_tile] + q_parts)
    ak = stack(k_parts)   # k's bias column (a param) is appended by the caller
    return aq, ak


# ---------------------------------------------------------------------------
# variants: fwd(params, x) -> y; params are the model SwinBlock's tree
# ---------------------------------------------------------------------------

def make_v0(H, C, heads, shift, dtype):
    import jax.numpy as jnp

    from imageclassification_tpu.models.swin import SwinBlock

    blk = SwinBlock(dim=C, num_heads=heads, window=W, shift=shift,
                    attn_layout="legacy", dtype=dtype)

    def fwd(params, x):
        return blk.apply({"params": params}, x)

    def init(rng):
        return blk.init({"params": rng},
                        jnp.zeros((1, H, H, C), dtype))["params"]

    return init, fwd


def make_v1(H, C, heads, shift, dtype):
    """Fused partition: qkv in NHWC, one transpose each way."""
    import jax
    import jax.numpy as jnp

    from imageclassification_tpu.models.swin import _shift_attn_mask

    nWh = H // W
    hd = C // heads
    scale = hd ** -0.5

    def fwd(params, x):
        p = params
        bias = _bias_nm(p, dtype)                           # [h, N, N]
        y = _ln(x, p["norm1"])
        if shift:
            y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
        qkv = _dense(y, p["attn"]["qkv"])
        q, k, v = _to_windows(qkv, 1, nWh, heads, hd)       # [B,nW,h,N,hd]
        attn = jnp.einsum("bghnk,bghmk->bghnm", q * scale, k)
        if shift:
            mask = jnp.asarray(_shift_attn_mask(H, H, W, shift), dtype)
            attn = attn + (bias[None] + mask[:, None])[None]
        else:
            attn = attn + bias[None, None]
        attn = jax.nn.softmax(attn, axis=-1)
        o = jnp.einsum("bghnm,bghmk->bghnk", attn, v)
        o = _from_windows(o, 1, nWh, heads, hd)
        o = _dense(o, p["attn"]["proj"])
        if shift:
            o = jnp.roll(o, (shift, shift), axis=(1, 2))
        x = x + o
        return x + _mlp(p["mlp"], _ln(x, p["norm2"]))

    return fwd


def make_v2(H, C, heads, shift, dtype, G=1):
    """v1 + augmented-contraction bias/mask; G windows per attention group."""
    import jax
    import jax.numpy as jnp

    nWh = H // W
    nW = nWh * nWh
    hd = C // heads
    scale = hd ** -0.5
    assert nWh % G == 0
    aq_np, aks_np = _static_augments(H, shift, G)           # [nW/G, GN, *]

    def fwd(params, x):
        p = params
        Bv = x.shape[0]
        bias_col = _bias_nm(p, dtype).transpose(0, 2, 1)    # [h, N(j), N(i)]
        bias_tile = jnp.tile(bias_col, (1, G, 1))           # [h, GN, N]
        aq = jnp.asarray(aq_np, dtype)
        aks = jnp.asarray(aks_np, dtype)
        ak = jnp.concatenate([
            jnp.broadcast_to(bias_tile[None],
                             (nW // G,) + bias_tile.shape),
            jnp.broadcast_to(aks[:, None],
                             (nW // G, heads) + aks.shape[-2:]),
        ], -1)                                              # [nW/G,h,GN,D]
        y = _ln(x, p["norm1"])
        if shift:
            y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
        qkv = _dense(y, p["attn"]["qkv"])
        q, k, v = _to_windows(qkv, G, nWh, heads, hd)       # [B,nW/G,h,GN,hd]
        qa = jnp.concatenate([
            q * scale,
            jnp.broadcast_to(aq[None, :, None],
                             (Bv, nW // G, heads) + aq.shape[-2:]),
        ], -1)
        ka = jnp.concatenate(
            [k, jnp.broadcast_to(ak[None], (Bv,) + ak.shape)], -1)
        attn = jax.nn.softmax(
            jnp.einsum("bghnk,bghmk->bghnm", qa, ka), axis=-1)
        o = jnp.einsum("bghnm,bghmk->bghnk", attn, v)
        o = _from_windows(o, G, nWh, heads, hd)
        o = _dense(o, p["attn"]["proj"])
        if shift:
            o = jnp.roll(o, (shift, shift), axis=(1, 2))
        x = x + o
        return x + _mlp(p["mlp"], _ln(x, p["norm2"]))

    return fwd


def _static_block_mask(H, shift, G):
    """[nW/G, G·N, G·N] additive float32: −100 across windows of a merged
    group and (for shifted blocks) across shift regions — the broadcast-add
    counterpart of _static_augments."""
    nW = (H // W) ** 2
    win = np.repeat(np.arange(G), N)                        # [GN]
    blocked = win[:, None] != win[None, :]                  # cross-window
    blocked = np.broadcast_to(blocked, (nW // G, G * N, G * N)).copy()
    if shift:
        reg = _regions_per_window(H, shift).reshape(nW // G, G * N)
        blocked |= reg[:, :, None] != reg[:, None, :]
    return np.where(blocked, -100.0, 0.0).astype(np.float32)


def make_v4(H, C, heads, shift, dtype, G):
    """v1's fused partition + G-window merging, with bias/mask as ONE
    precomputed broadcast-add (no augmented concat streams)."""
    import jax
    import jax.numpy as jnp

    nWh = H // W
    nW = nWh * nWh
    hd = C // heads
    scale = hd ** -0.5
    assert nWh % G == 0
    static_np = _static_block_mask(H, shift, G)             # [nW/G, GN, GN]

    def fwd(params, x):
        p = params
        bias = _bias_nm(p, dtype)                           # [h, N, N]
        combined = (jnp.tile(bias, (1, G, G))[None]
                    + jnp.asarray(static_np, dtype)[:, None])
        y = _ln(x, p["norm1"])
        if shift:
            y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
        qkv = _dense(y, p["attn"]["qkv"])
        q, k, v = _to_windows(qkv, G, nWh, heads, hd)       # [B,nW/G,h,GN,hd]
        attn = jnp.einsum("bghnk,bghmk->bghnm", q * scale, k)
        attn = jax.nn.softmax(attn + combined[None], axis=-1)
        o = jnp.einsum("bghnm,bghmk->bghnk", attn, v)
        o = _from_windows(o, G, nWh, heads, hd)
        o = _dense(o, p["attn"]["proj"])
        if shift:
            o = jnp.roll(o, (shift, shift), axis=(1, 2))
        x = x + o
        return x + _mlp(p["mlp"], _ln(x, p["norm2"]))

    return fwd


def time_variant(fwd, params, x0, grad, label):
    import jax
    import jax.numpy as jnp

    if grad:
        def loss(p, x):
            return jnp.sum(fwd(p, x).astype(jnp.float32) ** 2)
        g = jax.grad(loss, argnums=(0, 1))

        def body(carry, _):
            p, x = carry
            dp, dx = g(p, x)
            p = jax.tree.map(lambda a, b: a + 1e-6 * b.astype(a.dtype), p, dp)
            return (p, x + 1e-6 * dx.astype(x.dtype)), x[0, 0, 0, 0]
        carry0 = (params, x0)
    else:
        def body(carry, _):
            x, = carry
            return (x + 1e-6 * fwd(params, x),), x[0, 0, 0, 0]
        carry0 = (x0,)
    return _scan_time(body, carry0, label)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/imgcls_tpu_xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    on_cpu = jax.devices()[0].platform == "cpu"
    dtype = jnp.bfloat16
    results = {"B": B}
    only = os.environ.get("SWIN_STAGES", "0,1,2")
    for s in range(4):
        if str(s) not in only.split(","):
            continue
        H, C, heads = STAGES[s]
        shift = W // 2 if H > W else 0                      # shifted block
        init, v0 = make_v0(H, C, heads, shift, dtype)
        params = init(jax.random.key(0))
        rng = np.random.default_rng(0)
        x0 = jnp.asarray(rng.normal(size=(B, H, H, C)) * 0.1, dtype)

        nWh = H // W
        variants = {"v0": v0, "v1": make_v1(H, C, heads, shift, dtype),
                    "v2": make_v2(H, C, heads, shift, dtype, G=1)}
        for G in (2, 4):
            if nWh % G == 0 and nWh >= G:
                variants[f"v3_g{G}"] = make_v2(H, C, heads, shift, dtype,
                                               G=G)
                variants[f"v4_g{G}"] = make_v4(H, C, heads, shift, dtype,
                                               G=G)

        # golden: every rewrite equals the model block in f32
        xg = jnp.asarray(rng.normal(size=(2, H, H, C)) * 0.1, jnp.float32)
        _, v0f = make_v0(H, C, heads, shift, jnp.float32)
        pf = jax.tree.map(lambda a: a.astype(jnp.float32), params)
        ref = np.asarray(jax.jit(v0f)(pf, xg))
        gold = {}
        for name in list(variants):
            if name == "v0":
                continue
            if name == "v1":
                fn = make_v1(H, C, heads, shift, jnp.float32)
            elif name.startswith("v4"):
                fn = make_v4(H, C, heads, shift, jnp.float32,
                             G=int(name.split("_g")[1]))
            else:
                G = 1 if name == "v2" else int(name.split("_g")[1])
                fn = make_v2(H, C, heads, shift, jnp.float32, G=G)
            err = float(np.max(np.abs(np.asarray(jax.jit(fn)(pf, xg)) - ref)))
            gold[name] = err
            print(f"stage{s} {name} golden max|Δ| = {err:.2e}", flush=True)
            # v2/v3 carry the ±100 mask/window penalties through the dot's
            # f32 accumulation; cancellation at ulp(100)≈8e-6 per logit
            # amplifies to ~1e-3 through softmax+proj+mlp — an order below
            # bf16 training noise (v1, which keeps the additive mask, is
            # bit-exact vs v0)
            assert err < 2e-3, (s, name, err)
        results[f"stage{s}_golden_max_abs_err"] = gold
        if on_cpu:
            print(f"stage{s}: CPU — golden only, skipping timing",
                  flush=True)
            continue

        row = {}
        for name, fn in variants.items():
            row[name] = {
                "fwd_ms": round(time_variant(
                    fn, params, x0, False, f"s{s} {name} fwd") * 1e3, 3),
                "fwdbwd_ms": round(time_variant(
                    fn, params, x0, True, f"s{s} {name} fwdbwd") * 1e3, 3),
            }
        results[f"stage{s}"] = row
        out = Path(__file__).parent / "swin_layout_bench.json"
        out.write_text(json.dumps(results, indent=2))
        print(f"stage {s} done -> {out}", flush=True)


if __name__ == "__main__":
    main()
