"""Fused ResNet bottleneck block Pallas kernel (TPU).

Both detector backbones (DBNet's dilated torchvision ResNet-50,
RT-DETR's PResNet-50-d) are bandwidth-bound stacks of bottleneck blocks:
1x1 conv -> BN/relu -> 3x3 conv (optionally dilated) -> BN/relu ->
1x1 conv -> BN -> (+shortcut) -> relu.  XLA fuses each conv with its BN
and activation but still round-trips every intermediate activation
through HBM (3 reads + 3 writes of the block's working set); measured
4.7 ms of DBNet's 7.4 ms and 3.4 ms of RT-DETR's 4.0 ms forward.

This kernel runs ONE stride-1 bottleneck block per pallas_call with all
intermediates VMEM-resident.  The input stays in HBM (memory_space ANY);
each grid program DMAs a row strip plus a ``dilation``-row halo in three
copies (body + two halos, edge halos clamped into bounds and their rows
masked after the 1x1 stage — the mask also realizes the 3x3 conv's zero
row-padding, which applies to the POST-1x1 activations, not to x, so an
HBM-side pad would be wrong as well as slow).  The 3x3 conv itself is 9
statically-shifted matmuls on the MXU; column zero-padding comes from
the shift's jnp.pad.  BN constants are folded into the conv
weights/biases by the caller (``fold_bn``).

Stride-2 blocks (one per stage) keep the XLA path — their output
geometry halves and the traffic win is small.

STATUS: opt-in (YOMITOKU_TPU_FUSED_BOTTLENECK=1), not the default.
Measured against the REAL conv path in-model it is a net loss (DBNet
7.4 -> 11.2 ms, RT-DETR 4.0 -> 6.0 ms): XLA's TPU conv emitter already
runs bottleneck chains near bandwidth (~0.2 ms/block on RT-DETR
stage1), and every pallas_call boundary forces its operands into
canonical layouts, inserting relayouts between consecutive blocks.  The
kernel beats an einsum-formulated block by up to 11x, which measures
the einsum form's weakness, not the conv emitter's.  Kept (with parity
tests) as the starting point for a future whole-stage kernel where the
inter-block layouts stay VMEM-resident.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fold_bn(scale, bias, mean, var, eps=1e-5):
    """FrozenBatchNorm -> (mul, add) channel constants."""
    mul = scale / jnp.sqrt(var + eps)
    return mul, bias - mean * mul


def _kernel(
    x_hbm, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref, wd_ref, bd_ref,
    o_ref, xs, sems, *, th, H, W, Cin, Cm, Cout, d, has_down,
):
    b = pl.program_id(0)
    r = pl.program_id(1)
    rows = th + 2 * d
    r0 = r * th

    # body rows [r0, r0+th) -> scratch [d, d+th); halos clamped into
    # bounds (their content is masked after the 1x1 when out of page)
    cp0 = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(r0, th)], xs.at[pl.ds(d, th)], sems.at[0]
    )
    cp1 = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(jnp.maximum(r0 - d, 0), d)],
        xs.at[pl.ds(0, d)], sems.at[1],
    )
    cp2 = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(jnp.minimum(r0 + th, H - d), d)],
        xs.at[pl.ds(d + th, d)], sems.at[2],
    )
    cp0.start()
    cp1.start()
    cp2.start()
    cp0.wait()
    cp1.wait()
    cp2.wait()

    dt = o_ref.dtype

    # 1x1 reduce + relu over the full strip, then zero out-of-page rows
    # (the 3x3's zero padding applies to THIS tensor)
    x_flat = xs[:].reshape(rows * W, Cin)
    h1 = jax.lax.dot_general(
        x_flat, w1_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[0].astype(jnp.float32)
    h1 = jnp.maximum(h1, 0.0).astype(dt).reshape(rows, W, Cm)
    abs_row = r0 - d + jax.lax.broadcasted_iota(jnp.int32, (rows, 1, 1), 0)
    h1 = jnp.where((abs_row >= 0) & (abs_row < H), h1, jnp.zeros_like(h1))

    # 3x3 (dilation d): 9 statically-shifted matmuls
    acc = jnp.zeros((th * W, Cm), jnp.float32)
    for t in (0, 1, 2):
        rt = h1[t * d : t * d + th]
        for u in (0, 1, 2):
            if u == 1:
                tap = rt
            elif u == 0:
                tap = jnp.pad(rt[:, : W - d], ((0, 0), (d, 0), (0, 0)))
            else:
                tap = jnp.pad(rt[:, d:], ((0, 0), (0, d), (0, 0)))
            acc += jax.lax.dot_general(
                tap.reshape(th * W, Cm), w2_ref[3 * t + u],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    h2 = jnp.maximum(acc + b2_ref[0].astype(jnp.float32), 0.0).astype(dt)

    # 1x1 expand
    out = jax.lax.dot_general(
        h2, w3_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b3_ref[0].astype(jnp.float32)

    # shortcut (+ optional 1x1 projection)
    res = xs[d : d + th].reshape(th * W, Cin)
    if has_down:
        res = jax.lax.dot_general(
            res, wd_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bd_ref[0].astype(jnp.float32)
    out = jnp.maximum(out + res.astype(jnp.float32), 0.0)
    o_ref[0] = out.reshape(th, W, Cout).astype(dt)


def _pick_th(H, W, Cin, Cm, Cout, d, budget=11 * 2**20):
    """Largest strip height whose working set fits VMEM.  Sizes are
    lane-padded (channels round up to 128) and the output block counts
    twice (Mosaic double-buffers grid outputs); the budget leaves room
    for tap temporaries and compiler scratch under the 16 MB limit."""

    def pad(c):
        return -(-c // 128) * 128

    best = None
    for th in range(8, min(H, 128) + 1, 8):
        if H % th:
            continue
        rows = th + 2 * d
        est = (
            rows * W * pad(Cin) * 2          # x scratch (bf16)
            + rows * W * pad(Cm) * 2         # h1
            + 2 * th * W * pad(Cm) * 4       # conv acc (f32) + tap temp
            + th * W * pad(Cout) * 4         # out acc (f32)
            + 2 * th * W * pad(Cout) * 2     # out block (double-buffered)
        )
        if est <= budget:
            best = th
    return best


def bottleneck_th(H, W, Cin, Cm, Cout, d=1):
    """Public: the strip height the kernel would use, or None if the
    shape can't run it (caller falls back to XLA): H must tile into
    8-aligned strips, and the (rows, W, Cin) buffers the halo DMA slices
    must be tiling-aligned (W to the 8-sublane tile, Cin to the 128-lane
    tile — Mosaic rejects unaligned memref slices)."""
    if H % 8 or H < 2 * d + 8 or Cin % 128 or W % 8:
        return None
    return _pick_th(H, W, Cin, Cm, Cout, d)


@functools.partial(
    jax.jit,
    static_argnames=("dilation", "interpret"),
)
def fused_bottleneck(
    x, w1, b1, w2, b2, w3, b3, wd=None, bd=None, dilation=1, interpret=False,
):
    """One stride-1 bottleneck block: x (B, H, W, Cin) -> (B, H, W, Cout).

    w1 (Cin, Cm), w2 (9, Cm, Cm) [tap 3*t+u], w3 (Cm, Cout) with BN
    folded into the biases (``fold_bn``); wd/bd: optional 1x1 shortcut
    projection (Cin, Cout)."""
    B, H, W, Cin = x.shape
    Cm = w1.shape[1]
    Cout = w3.shape[1]
    d = dilation
    has_down = wd is not None
    if not has_down:
        wd = jnp.zeros((1, 1), x.dtype)
        bd = jnp.zeros((1,), jnp.float32)
    th = _pick_th(H, W, Cin, Cm, Cout, d)
    if th is None:
        return bottleneck_reference(
            x, w1, b1, w2, b2, w3, b3,
            wd if has_down else None, bd if has_down else None,
            dilation=d,
        ).astype(x.dtype)

    vspec = lambda shape: pl.BlockSpec(
        shape, lambda b, r: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(
            _kernel, th=th, H=H, W=W, Cin=Cin, Cm=Cm, Cout=Cout, d=d,
            has_down=has_down,
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, W, Cout), x.dtype),
        grid=(B, H // th),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            vspec(w1.shape), vspec((1, Cm)),
            vspec(w2.shape), vspec((1, Cm)),
            vspec(w3.shape), vspec((1, Cout)),
            vspec(wd.shape), vspec((1,) + bd.shape),
        ],
        out_specs=pl.BlockSpec(
            (1, th, W, Cout), lambda b, r: (b, r, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((th + 2 * d, W, Cin), x.dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=interpret,
    )(
        x, w1, b1.reshape(1, Cm), w2, b2.reshape(1, Cm),
        w3, b3.reshape(1, Cout), wd, bd.reshape((1,) + bd.shape),
    )


def bottleneck_reference(x, w1, b1, w2, b2, w3, b3, wd=None, bd=None,
                         dilation=1):
    """jnp reference with identical semantics (BN already folded)."""
    d = dilation
    h = jnp.maximum(jnp.einsum("bhwc,cm->bhwm", x, w1) + b1, 0.0)
    hp = jnp.pad(h, ((0, 0), (d, d), (d, d), (0, 0)))
    acc = 0.0
    H, W = x.shape[1:3]
    for t in (0, 1, 2):
        for u in (0, 1, 2):
            tap = hp[:, t * d : t * d + H, u * d : u * d + W]
            acc = acc + jnp.einsum("bhwm,mn->bhwn", tap, w2[3 * t + u])
    h2 = jnp.maximum(acc + b2, 0.0)
    out = jnp.einsum("bhwm,mn->bhwn", h2, w3) + b3
    res = x if wd is None else jnp.einsum("bhwc,cn->bhwn", x, wd) + bd
    return jnp.maximum(out + res, 0.0)
