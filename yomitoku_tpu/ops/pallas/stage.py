"""Whole-stage fused ResNet kernel: N identity bottlenecks, one
pallas_call, inter-block activations VMEM-resident.

Round 2's per-block kernel (ops/pallas/bottleneck.py) broke even on
compute but lost in-model: every pallas_call boundary forces canonical
layouts, so running blocks one call at a time inserted a relayout
between every pair of blocks.  This kernel runs a stage's whole
stride-1 tail (blocks 1..N of layer1..layer4 — the stride/projection
block 0 stays XLA) in ONE call: the input strip is DMA'd once with an
N*dilation-row halo, each block consumes d rows of margin, and only the
final block's rows return to HBM — eliminating (N-1) round-trips of the
stage working set plus (N-1) relayout pairs.

Per block (BN folded by the caller):  h = relu(x @ w1 + b1);
h = relu(conv3x3_d(h) + b2)  [9 statically-shifted MXU matmuls, zero
padding realized by masking h at out-of-page rows / shifted-in zero
columns];  x = relu(h @ w3 + b3 + x).

Reference geometry: yomitoku/models/dbnet_plus.py:30 (torchvision
resnet50, dilated stage 4) — all identity blocks are stride-1 with
Cin == Cout == 4*Cm.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(
    x_hbm, w1s, b1s, w2s, b2s, w3s, b3s, o_ref, xa, xb, sems,
    *, th, H, W, C, Cm, N, d,
):
    b = pl.program_id(0)
    r = pl.program_id(1)
    m = N * d
    r0 = r * th

    # one DMA of the strip + clamped halos (out-of-page halo rows hold
    # clamped duplicates; every block masks them after its 1x1, which is
    # where the 3x3's zero padding semantically lives)
    cp0 = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(r0, th)], xa.at[pl.ds(m, th)], sems.at[0]
    )
    cp1 = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(jnp.maximum(r0 - m, 0), m)],
        xa.at[pl.ds(0, m)], sems.at[1],
    )
    cp2 = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(jnp.minimum(r0 + th, H - m), m)],
        xa.at[pl.ds(m + th, m)], sems.at[2],
    )
    cp0.start()
    cp1.start()
    cp2.start()
    cp0.wait()
    cp1.wait()
    cp2.wait()

    dt = o_ref.dtype
    src, dst = xa, xb
    for j in range(N):  # unrolled: every slice below is static
        mj = m - j * d           # margin of this block's input
        vin = th + 2 * mj        # valid input rows
        vout = vin - 2 * d       # rows this block produces
        lo = m - mj              # first valid row in the strip buffer

        x_in = src[lo : lo + vin]                       # (vin, W, C)
        h1 = jax.lax.dot_general(
            x_in.reshape(vin * W, C), w1s[j],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b1s[j].astype(jnp.float32)
        h1 = jnp.maximum(h1, 0.0).astype(dt).reshape(vin, W, Cm)
        abs_row = (
            r0 - mj + jax.lax.broadcasted_iota(jnp.int32, (vin, 1, 1), 0)
        )
        h1 = jnp.where((abs_row >= 0) & (abs_row < H), h1, jnp.zeros_like(h1))

        acc = jnp.zeros((vout * W, Cm), jnp.float32)
        for t in (0, 1, 2):
            rt = h1[t * d : t * d + vout]
            for u in (0, 1, 2):
                if u == 1:
                    tap = rt
                elif u == 0:
                    tap = jnp.pad(rt[:, : W - d], ((0, 0), (d, 0), (0, 0)))
                else:
                    tap = jnp.pad(rt[:, d:], ((0, 0), (0, d), (0, 0)))
                acc += jax.lax.dot_general(
                    tap.reshape(vout * W, Cm), w2s[j, 3 * t + u],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
        h2 = jnp.maximum(
            acc + b2s[j].astype(jnp.float32), 0.0
        ).astype(dt)

        out = jax.lax.dot_general(
            h2, w3s[j],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b3s[j].astype(jnp.float32)
        res = x_in[d : d + vout].reshape(vout * W, C)
        out = jnp.maximum(out + res.astype(jnp.float32), 0.0)
        dst[lo + d : lo + d + vout] = out.reshape(vout, W, C).astype(dt)
        src, dst = dst, src

    o_ref[0] = src[m : m + th]


def _pick_th(H, W, C, Cm, N, d, budget=11 * 2**20):
    """Largest strip height whose working set fits VMEM (two ping-pong
    strip buffers + the f32 accumulators + the double-buffered output)."""

    def pad(c):
        return -(-c // 128) * 128

    m = N * d
    best = None
    for th in range(8, min(H, 128) + 1, 8):
        if H % th:
            continue
        rows = th + 2 * m
        est = (
            2 * rows * W * pad(C) * 2        # ping-pong strips (bf16)
            + rows * W * pad(Cm) * 2         # h1
            + 2 * rows * W * pad(Cm) * 4     # conv acc (f32) + tap temp
            + rows * W * pad(C) * 4          # expand acc (f32)
            + 2 * th * W * pad(C) * 2        # out block (double-buffered)
        )
        if est <= budget:
            best = th
    return best


def stage_th(H, W, C, Cm, N, d=1):
    """The strip height the kernel would use, or None when the shape
    can't run it (caller falls back to XLA)."""
    if N < 2 or H % 8 or H < 2 * N * d + 8 or C % 128 or W % 8:
        return None
    return _pick_th(H, W, C, Cm, N, d)


@functools.partial(jax.jit, static_argnames=("dilation", "interpret"))
def fused_identity_stage(x, w1s, b1s, w2s, b2s, w3s, b3s, dilation=1,
                         interpret=False):
    """N stride-1 identity bottlenecks: x (B, H, W, C) -> (B, H, W, C).

    w1s (N, C, Cm), w2s (N, 9, Cm, Cm) [tap 3*t+u], w3s (N, Cm, C); BN
    folded into weights/biases (ops.pallas.bottleneck.fold_bn)."""
    B, H, W, C = x.shape
    N, _, Cm = w1s.shape
    d = dilation
    th = stage_th(H, W, C, Cm, N, d)
    if th is None:
        from .bottleneck import bottleneck_reference

        for j in range(N):
            x = bottleneck_reference(
                x, w1s[j], b1s[j], w2s[j], b2s[j], w3s[j], b3s[j],
                dilation=d,
            ).astype(x.dtype)
        return x

    m = N * d
    vspec = lambda shape: pl.BlockSpec(
        shape, lambda b, r: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(
            _kernel, th=th, H=H, W=W, C=C, Cm=Cm, N=N, d=d,
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), x.dtype),
        grid=(B, H // th),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            vspec(w1s.shape), vspec(b1s.shape),
            vspec(w2s.shape), vspec(b2s.shape),
            vspec(w3s.shape), vspec(b3s.shape),
        ],
        out_specs=pl.BlockSpec(
            (1, th, W, C), lambda b, r: (b, r, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((th + 2 * m, W, C), x.dtype),
            pltpu.VMEM((th + 2 * m, W, C), x.dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=interpret,
    )(x, w1s, b1s, w2s, b2s, w3s, b3s)
