"""Fused heterogeneous window attention — Pallas TPU kernel.

The H3GAT attention core computes, per BEV window, per head h and sender
j:  sim = (q W_att[ij,h]) k_j^T + bias;  softmax over (j, tokens);
out = sum_j attn_j (v_j W_msg[ij,h]^T).  Expressed in XLA einsums this
materializes the (windows, heads, Tq, J*Tk) similarity/attention tensors
in HBM (~2 GB per phase) and lowers to thousands of (64x32)@(32x64)
batched matmuls at a few percent MXU utilization.

This kernel fuses the whole per-window computation in VMEM: one grid
program per (receiver, window) holds q (T, C), k/v (J, T, C), the typed
relation matrices, bias and mask, and never writes an intermediate to
HBM.  The XLA einsum path remains as a fallback and as the correctness
oracle (tests compare both).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q_ref, k_ref, v_ref, watt_ref, wmsg_ref, bias_ref, mask_ref,
            out_ref, *, heads: int, dim_head: int, n_senders: int,
            w_block: int):
    t = q_ref.shape[-2]
    d = dim_head
    neg = jnp.asarray(-1e9, jnp.float32)

    for wb in range(w_block):
        q_all = q_ref[0, wb].astype(jnp.float32)  # (T, C)
        for h in range(heads):
            q_h = q_all[:, h * d:(h + 1) * d]  # (T, d)
            sim_parts = []
            for j in range(n_senders):
                w = watt_ref[0, j, h].astype(jnp.float32)  # (d, d)
                qw = jnp.dot(q_h, w, preferred_element_type=jnp.float32)
                k_h = k_ref[0, j, wb, :, h * d:(h + 1) * d].astype(
                    jnp.float32)
                s = jnp.dot(qw, k_h.T, preferred_element_type=jnp.float32)
                s = s + bias_ref[h].astype(jnp.float32)
                m = mask_ref[0, wb, j].astype(jnp.float32)  # (T,)
                s = jnp.where(m[None, :] > 0, s, neg)
                sim_parts.append(s)
            sim = jnp.concatenate(sim_parts, axis=1)  # (T, J*T)

            sim_max = jnp.max(sim, axis=1, keepdims=True)
            exp = jnp.exp(sim - sim_max)
            denom = jnp.sum(exp, axis=1, keepdims=True)
            attn = exp / denom  # (T, J*T)
            # fully-masked query rows (exclude_self + invalid senders)
            # must emit zero, matching the XLA oracle — uniform attention
            # over -1e9 entries would leak masked values
            attn = jnp.where(sim_max <= neg / 2, jnp.zeros_like(attn),
                             attn)

            acc = jnp.zeros((t, d), jnp.float32)
            for j in range(n_senders):
                v_h = v_ref[0, j, wb, :, h * d:(h + 1) * d].astype(
                    jnp.float32)
                wm = wmsg_ref[0, j, h].astype(jnp.float32)
                v_msg = jnp.dot(v_h, wm.T,
                                preferred_element_type=jnp.float32)
                acc = acc + jnp.dot(attn[:, j * t:(j + 1) * t], v_msg,
                                    preferred_element_type=jnp.float32)
            out_ref[0, wb, :, h * d:(h + 1) * d] = acc.astype(
                out_ref.dtype)


@partial(jax.jit,
         static_argnames=("heads", "dim_head", "interpret", "w_block"))
def hetero_window_attention(q, k, v, w_att, w_msg, bias, mask,
                            heads: int, dim_head: int,
                            interpret: bool = False, w_block: int = 4):
    """Fused typed window attention.

    q: (N, W, T, C) — N = batch*receivers, W windows, T tokens/window;
    k, v: (N, J, W, T, C); w_att, w_msg: (N, J, heads, d, d);
    bias: (heads, T, T); mask: (N, J, W, T).
    Returns (N, W, T, C).

    w_block windows are processed per grid program to amortize program
    launch overhead (VMEM per program ~ 2 * w_block * J * T * C * 4B).
    """
    n, w_cnt, t, c = q.shape
    j = k.shape[1]
    while w_cnt % w_block:
        w_block //= 2
    grid = (n, w_cnt // w_block)
    kernel = partial(_kernel, heads=heads, dim_head=dim_head, n_senders=j,
                     w_block=w_block)
    wb = w_block
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, wb, t, c), lambda i, wi: (i, wi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, j, wb, t, c), lambda i, wi: (i, 0, wi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, j, wb, t, c), lambda i, wi: (i, 0, wi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, j, heads, dim_head, dim_head),
                         lambda i, wi: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, j, heads, dim_head, dim_head),
                         lambda i, wi: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((heads, t, t), lambda i, wi: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            # mask transposed to (N, W, J, T) so the block's trailing two
            # dims (J, T) cover full axes (TPU lowering constraint)
            pl.BlockSpec((1, wb, j, t), lambda i, wi: (i, wi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, wb, t, c), lambda i, wi: (i, wi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, w_cnt, t, c), q.dtype),
        interpret=interpret,
    )(
        q, k, v, w_att, w_msg, bias, jnp.swapaxes(mask, 1, 2),
    )


@partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def fused_window_attention(q, k, v, w_att, w_msg, bias, mask,
                           heads: int, dim_head: int):
    """Pallas forward with an XLA-recompute backward (the kernel itself
    is not reverse-differentiable; training recomputes through the
    einsum oracle, inference pays only the fused kernel)."""
    return hetero_window_attention(q, k, v, w_att, w_msg, bias, mask,
                                   heads=heads, dim_head=dim_head)


def _fwa_fwd(q, k, v, w_att, w_msg, bias, mask, heads, dim_head):
    out = hetero_window_attention(q, k, v, w_att, w_msg, bias, mask,
                                  heads=heads, dim_head=dim_head)
    return out, (q, k, v, w_att, w_msg, bias, mask)


def _fwa_bwd(heads, dim_head, residuals, g):
    q, k, v, w_att, w_msg, bias, mask = residuals
    _, vjp = jax.vjp(
        lambda *a: hetero_window_attention_xla(*a, heads=heads,
                                               dim_head=dim_head),
        q, k, v, w_att, w_msg, bias, mask,
    )
    return vjp(g)


fused_window_attention.defvjp(_fwa_fwd, _fwa_bwd)


def _plain_kernel(q_ref, kv_ref, bias_ref, mask_ref, out_ref, *,
                  heads: int, dim_head: int, n_senders: int, w_block: int):
    """Untyped multi-sender window attention (relation weights already
    folded into K/V upstream).  K and V arrive as ONE concatenated
    (…, 2C) operand — the 2C channel slice is free in VMEM, so the
    module never materializes separate K/V layouts in HBM (each was a
    ~0.4 ms relayout copy per phase at production scale)."""
    t = q_ref.shape[-2]
    d = dim_head
    c = heads * d
    neg = jnp.asarray(-1e9, jnp.float32)
    j = n_senders

    q = q_ref[0].astype(jnp.float32)  # (wb, T, C)
    # concatenate K/V/mask across senders ONCE: each head then runs a
    # single (wb, T, d) x (wb, J*T, d) similarity dot with N = J*T
    # MXU lanes instead of J separate N=T dots (2.5x fewer batched
    # matmul issues; reduction order per output element is unchanged,
    # so the results are bit-identical to the per-sender form)
    # concat in the INPUT dtype (exact), upcast per-head lane slices at
    # dot time — a full-2C f32 kv_cat overflows the 16 MB scoped VMEM
    # at J=5 bf16 production shapes
    kv_cat = jnp.concatenate(
        [kv_ref[0, jj] for jj in range(j)], axis=1)  # (wb, J*T, 2C)
    # mask/bias arrive pre-concatenated from the host (tiny tensors;
    # Mosaic rejects in-kernel concats of lane-offset slices)
    m_cat = mask_ref[0].astype(jnp.float32)  # (wb, J*T)
    for h in range(heads):
        qh = q[:, :, h * d:(h + 1) * d]  # (wb, T, d)
        bias_cat = bias_ref[h].astype(jnp.float32)  # (T, J*T)
        kh = kv_cat[:, :, h * d:(h + 1) * d].astype(
            jnp.float32)  # (wb, J*T, d)
        sim = jax.lax.dot_general(
            qh, kh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # (wb, T, J*T)
        sim = jnp.where(m_cat[:, None, :] > 0, sim + bias_cat[None], neg)
        v_cat = kv_cat[:, :, c + h * d:c + (h + 1) * d].astype(
            jnp.float32)  # (wb, J*T, d)

        mx = jnp.max(sim, axis=-1, keepdims=True)
        ex = jnp.exp(sim - mx)
        den = jnp.sum(ex, axis=-1, keepdims=True)
        attn = ex / den
        attn = jnp.where(mx <= neg / 2, jnp.zeros_like(attn), attn)

        out = jax.lax.dot_general(
            attn, v_cat, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # (wb, T, d)
        out_ref[0, :, :, h * d:(h + 1) * d] = out.astype(out_ref.dtype)


@partial(jax.jit,
         static_argnames=("heads", "dim_head", "interpret", "w_block"))
def plain_window_attention(q, kv, bias, mask, heads: int, dim_head: int,
                           interpret: bool = False, w_block: int = 16):
    """Fused untyped multi-sender window attention.

    q: (N, W, T, C); kv: (N, J, W, T, 2C) — relation-transformed, warped
    K and V concatenated on channels; bias: (heads, T, T);
    mask: (N, J, W, T).  Returns (N, W, T, C).
    """
    n, w_cnt, t, c = q.shape
    j = kv.shape[1]
    if q.dtype != jnp.bfloat16:
        # fp32 operands double the per-program block bytes; 16 windows
        # of 5-sender fp32 K/V overflow the 16 MB VMEM scoped budget
        w_block = min(w_block, 8)
    while w_cnt % w_block:
        w_block //= 2
    grid = (n, w_cnt // w_block)
    kernel = partial(_plain_kernel, heads=heads, dim_head=dim_head,
                     n_senders=j, w_block=w_block)
    wb = w_block
    # host-side concat layouts: mask (N, W, J*T) in sender-major token
    # order, bias tiled to (heads, T, J*T) — both tiny; the kernel's
    # one-dot-per-head form consumes them directly
    mask_cat = jnp.swapaxes(mask, 1, 2).reshape(n, w_cnt, j * t)
    bias_cat = jnp.concatenate([bias] * j, axis=-1)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, wb, t, c), lambda i, wi: (i, wi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, j, wb, t, 2 * c),
                         lambda i, wi: (i, 0, wi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((heads, t, j * t), lambda i, wi: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, wb, j * t), lambda i, wi: (i, wi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, wb, t, c), lambda i, wi: (i, wi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, w_cnt, t, c), q.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024),
        interpret=interpret,
    )(q, kv, bias_cat, mask_cat)


@partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_plain_window_attention(q, kv, bias, mask, heads: int,
                                 dim_head: int):
    """Pallas forward, XLA-recompute backward (same contract as
    :func:`fused_window_attention`).  kv: (N, J, W, T, 2C)."""
    return plain_window_attention(q, kv, bias, mask, heads=heads,
                                  dim_head=dim_head)


def _fpwa_fwd(q, kv, bias, mask, heads, dim_head):
    out = plain_window_attention(q, kv, bias, mask, heads=heads,
                                 dim_head=dim_head)
    return out, (q, kv, bias, mask)


def _fpwa_bwd(heads, dim_head, residuals, g):
    q, kv, bias, mask = residuals
    c = q.shape[-1]

    def oracle(q_, kv_, bias_, mask_):
        return plain_window_attention_xla(
            q_, kv_[..., :c], kv_[..., c:], bias_, mask_,
            heads=heads, dim_head=dim_head)

    _, vjp = jax.vjp(oracle, q, kv, bias, mask)
    return vjp(g)


fused_plain_window_attention.defvjp(_fpwa_fwd, _fpwa_bwd)


def plain_window_attention_xla(q, k, v, bias, mask, heads: int,
                               dim_head: int):
    """XLA reference for the untyped kernel (oracle + grad recompute).

    Accumulates in fp32 regardless of input dtype, like the kernel."""
    n, w_cnt, t, c = q.shape
    j = k.shape[1]
    d = dim_head
    qh = q.reshape(n, w_cnt, t, heads, d)
    kh = k.reshape(n, j, w_cnt, t, heads, d)
    vh = v.reshape(n, j, w_cnt, t, heads, d)
    sim = jnp.einsum("nwthd,njwshd->njwhts", qh, kh,
                     preferred_element_type=jnp.float32)
    sim = sim + bias.astype(jnp.float32)[None, None, None]
    sim = jnp.where(mask[:, :, :, None, None, :] > 0, sim, -1e9)
    sim = jnp.moveaxis(sim, 1, -2)  # (n, w, h, t, j, s)
    flat = sim.reshape(*sim.shape[:-2], j * t)
    attn = jax.nn.softmax(flat, axis=-1)
    attn = jnp.where(jnp.max(flat, -1, keepdims=True) <= -5e8,
                     jnp.zeros_like(attn), attn)
    attn = jnp.moveaxis(attn.reshape(sim.shape), -2, 1)
    out = jnp.einsum("njwhts,njwshd->nwthd", attn, vh,
                     preferred_element_type=jnp.float32)
    return out.reshape(n, w_cnt, t, heads * d).astype(q.dtype)


def hetero_window_attention_xla(q, k, v, w_att, w_msg, bias, mask,
                                heads: int, dim_head: int):
    """Reference XLA einsum implementation (oracle + fallback)."""
    n, w_cnt, t, c = q.shape
    j = k.shape[1]
    d = dim_head

    qh = q.reshape(n, w_cnt, t, heads, d)
    kh = k.reshape(n, j, w_cnt, t, heads, d)
    vh = v.reshape(n, j, w_cnt, t, heads, d)

    q_rel = jnp.einsum("nwthd,njhde->njwthe", qh, w_att)
    sim = jnp.einsum("njwthe,njwshe->njwhts", q_rel, kh)
    sim = sim + bias.transpose(0, 1, 2)[None, None, None]
    sim = jnp.where(mask[:, :, :, None, None, :] > 0, sim, -1e9)
    sim = jnp.moveaxis(sim, 1, -2)  # (n, w, h, t, j, s)
    flat = sim.reshape(*sim.shape[:-2], j * t)
    attn = jax.nn.softmax(flat, axis=-1)
    # fully-masked query rows emit zero (matches the kernel + module)
    attn = jnp.where(jnp.max(flat, -1, keepdims=True) <= -5e8,
                     jnp.zeros_like(attn), attn)
    attn = jnp.moveaxis(attn.reshape(sim.shape), -2, 1)
    v_msg = jnp.einsum("njhde,njwshe->njwshd", w_msg, vh)
    out = jnp.einsum("njwhts,njwshd->nwthd", attn, v_msg)
    return out.reshape(n, w_cnt, t, heads * d)


def _stripe_kernel(q_ref, kv_ref, bias_ref, mask_ref, out_ref, *,
                   heads: int, dim_head: int, n_senders: int, win: int):
    """LOCAL-style window attention on an 8-column stripe, read straight
    from the (N, H, W, C) spatial layout.

    Within a vertical stripe (all rows, ``win`` columns), every local
    window's tokens are CONTIGUOUS rows — so the (windows, tokens)
    arrangement is a free row-major reshape, never a transpose, and the
    XLA window-split/merge relayout copies disappear entirely.

    Mosaic ordering note: every (H, win, C) -> (windows, T, C) regroup
    happens AFTER the fp32 upcast (and the output regroup BEFORE the
    bf16 downcast).  In bf16 the win=8 sublane dim is half a (16, 128)
    register tile, so the collapse is a genuine repack Mosaic rejects
    ("infer-vector-layout: unsupported shape cast"); in fp32 the sublane
    tile is exactly 8, making the same collapse a layout no-op."""
    d = dim_head
    c = heads * d
    t = win * win
    neg = jnp.asarray(-1e9, jnp.float32)
    j = n_senders
    h = q_ref.shape[1]
    nw = h // win

    q = q_ref[0].astype(jnp.float32).reshape(nw, t, c)
    # sender concat hoisted out of the head loop — one N=J*T similarity
    # dot per head (see _plain_kernel; bit-identical reduction order)
    # upcast BEFORE the (H, win, C) -> (nw, T, C) regroup: in bf16 the
    # win=8 sublane collapse is a genuine register repack (half a
    # (16, 128) tile — the round-3 stripe lesson); in fp32 the sublane
    # tile is exactly 8 and the collapse is free.  The f32 kv_cat costs
    # VMEM (hence the raised vmem_limit) but keeps the regroups free.
    kv_cat = jnp.concatenate(
        [kv_ref[0, jj].astype(jnp.float32).reshape(nw, t, 2 * c)
         for jj in range(j)], axis=1)  # (nw, J*T, 2C)
    # mask/bias pre-concatenated host-side (Mosaic rejects in-kernel
    # concats of lane-offset slices)
    m_cat = mask_ref[0, 0].astype(jnp.float32)  # (nw, J*T)
    for hh in range(heads):
        qh = q[:, :, hh * d:(hh + 1) * d]  # (nw, T, d)
        bias_cat = bias_ref[hh].astype(jnp.float32)  # (T, J*T)
        kh = kv_cat[:, :, hh * d:(hh + 1) * d]  # (nw, J*T, d)
        sim = jax.lax.dot_general(
            qh, kh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # (nw, T, J*T)
        sim = jnp.where(m_cat[:, None, :] > 0, sim + bias_cat[None], neg)
        v_cat = kv_cat[:, :, c + hh * d:c + (hh + 1) * d]

        mx = jnp.max(sim, axis=-1, keepdims=True)
        ex = jnp.exp(sim - mx)
        den = jnp.sum(ex, axis=-1, keepdims=True)
        attn = ex / den
        attn = jnp.where(mx <= neg / 2, jnp.zeros_like(attn), attn)

        out = jax.lax.dot_general(
            attn, v_cat, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # (nw, T, d)
        out_ref[0, :, :, hh * d:(hh + 1) * d] = out.reshape(
            h, win, d).astype(out_ref.dtype)


@partial(jax.jit,
         static_argnames=("win", "heads", "dim_head", "interpret"))
def stripe_window_attention(q, kv, bias, mask, win: int, heads: int,
                            dim_head: int, interpret: bool = False):
    """LOCAL window attention over unsplit spatial tensors.

    q: (N, H, W, C); kv: (N, J, H, W, 2C); bias: (heads, T, T);
    mask: (N, J, H, W).  Returns (N, H, W, C) — the same numbers as
    window-splitting + :func:`plain_window_attention` + merging, with
    zero relayouts on either side of the kernel (the tiny mask is
    repacked host-side into a (N, J, stripes, H*win) token layout that
    satisfies the TPU block tiling rules).
    """
    n, h, w, c = q.shape
    j = kv.shape[1]
    assert h % win == 0 and w % win == 0
    stripes = w // win
    nw, t = h // win, win * win
    # (N, J, H, W) -> (N, stripes, nw, J*T): stripe si's windows in
    # sender-major concatenated token order — a cheap repack of a small
    # tensor, shaped so the kernel reads each stripe's (nw, J*T) mask
    # directly (no in-kernel concat, no dynamic sublane slice)
    mask_s = jnp.moveaxis(
        mask.reshape(n, j, nw, win, stripes, win), 4, 2
    ).reshape(n, j, stripes, nw, t)
    mask_cat = jnp.moveaxis(mask_s, 1, 3).reshape(n, stripes, nw, j * t)
    bias_cat = jnp.concatenate([bias] * j, axis=-1)  # (heads, T, J*T)
    grid = (n, stripes)
    kernel = partial(_stripe_kernel, heads=heads, dim_head=dim_head,
                     n_senders=j, win=win)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, h, win, c), lambda i, si: (i, 0, si, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, j, h, win, 2 * c),
                         lambda i, si: (i, 0, 0, si, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((heads, win * win, j * win * win),
                         lambda i, si: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nw, j * t),
                         lambda i, si: (i, si, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, win, c),
                               lambda i, si: (i, 0, si, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w, c), q.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024),
        interpret=interpret,
    )(q, kv, bias_cat, mask_cat)


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def fused_stripe_window_attention(q, kv, bias, mask, win: int,
                                  heads: int, dim_head: int):
    """Pallas forward, XLA-recompute backward through the split oracle."""
    return stripe_window_attention(q, kv, bias, mask, win=win,
                                   heads=heads, dim_head=dim_head)


def _fswa_fwd(q, kv, bias, mask, win, heads, dim_head):
    out = stripe_window_attention(q, kv, bias, mask, win=win,
                                  heads=heads, dim_head=dim_head)
    return out, (q, kv, bias, mask)


def _fswa_bwd(win, heads, dim_head, residuals, g):
    q, kv, bias, mask = residuals
    n, h, w, c = q.shape
    j = kv.shape[1]
    t = win * win

    def split(z, ch):
        # (N, [J,] H, W, ch) -> (N, [J,] W', T, ch), local style
        lead = z.shape[:-3]
        z = z.reshape(*lead, h // win, win, w // win, win, ch)
        z = jnp.moveaxis(z, -3, -4)
        return z.reshape(*lead, (h // win) * (w // win), t, ch)

    def oracle(q_, kv_, bias_, mask_):
        qw = split(q_, c)
        kvw = split(kv_, 2 * c)
        mw = split(mask_[..., None], 1)[..., 0]
        out = plain_window_attention_xla(
            qw, kvw[..., :c], kvw[..., c:], bias_, mw,
            heads=heads, dim_head=dim_head)
        out = out.reshape(n, h // win, w // win, win, win, c)
        out = jnp.moveaxis(out, -4, -3)
        return out.reshape(n, h, w, c)

    _, vjp = jax.vjp(oracle, q, kv, bias, mask)
    return vjp(g)


fused_stripe_window_attention.defvjp(_fswa_fwd, _fswa_bwd)
