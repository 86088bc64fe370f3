"""Packed-conv serving forwards (eval mode, bf16) for the full-section nets.

Pure functions over the SAME variable trees as models/fusionnet.py and
models/unet_sff.py, swapping the full-resolution conv stages onto the
pixel-packed Pallas conv3x3 kernel (kernels/conv3x3.py) with eval-mode
BatchNorm folded into the kernel epilogue. Levels at or below 320x320 and
the transposed convolutions stay on XLA (they are near their bandwidth
floor there). Training and any non-eval use keep the flax modules.

Concat-then-conv decoder stages use the weight-split identity
    conv(concat(a, b), W) == conv(a, W[:, :, :Ca]) + conv(b, W[:, :, Ca:])
so activations never need cross-lane repacking.

Reference semantics served: FusionNet
(sff_scripts_unfolding/model/model_fusionnet.py:65-145) and the SFF fusion
UNet (sff_scripts_fusion/model/model_unet.py:6-105).
"""

import os

import jax.numpy as jnp
from jax import lax

from sstem_tpu.kernels.conv3x3 import (
    _LANES,
    build_packed_weights,
    conv3x3_packed,
    fold_affine,
    pack_nhwc,
    unpack_nhwc,
)

_BF = jnp.bfloat16


# ---------------------------------------------------------------------------
# param-tree helpers (paths match the flax modules)
# ---------------------------------------------------------------------------

def _bn_affine(bn_p, bn_s, eps=1e-5):
    """Eval BatchNorm as y = x * scale + shift."""
    scale = bn_p["scale"] * lax.rsqrt(bn_s["var"] + eps)
    shift = bn_p["bias"] - bn_s["mean"] * scale
    return scale, shift


def _packed_conv_args(conv_p, bn_p, bn_s, c):
    """Fold conv weights/bias (+ optional BN) into kernel args at packing C;
    real in/out channels smaller than c are zero-padded."""
    w = conv_p["kernel"].astype(_BF)
    b = conv_p["bias"]
    kin, kout = w.shape[2], w.shape[3]
    if kin < c:
        w = jnp.pad(w, [(0, 0), (0, 0), (0, c - kin), (0, 0)])
    if kout < c:
        w = jnp.pad(w, [(0, 0), (0, 0), (0, 0), (0, c - kout)])
        b = jnp.pad(b, [(0, c - kout)])
    if bn_p is not None:
        s, t = _bn_affine(bn_p, bn_s)
        if s.shape[0] < c:
            s = jnp.pad(s, [(0, c - s.shape[0])], constant_values=1.0)
            t = jnp.pad(t, [(0, c - t.shape[0])])
    else:
        s = t = None
    r = build_packed_weights(w, _LANES // c)
    sc, sh = fold_affine(c, b, s, t)
    return r, sc, sh


def _cb(xq, p, s, act, c, wq, interpret=False):
    """_ConvBlock / _ContractBlock half: conv + BN + act (packed)."""
    r, sc, sh = _packed_conv_args(p["conv"]["Conv_0"],
                                  p["bn"]["BatchNorm_0"],
                                  s["bn"]["BatchNorm_0"], c)
    return conv3x3_packed(xq, r, sc, sh, act, wq=wq, interpret=interpret)


def _leaky(x):
    return jnp.where(x >= 0, x, 0.2 * x).astype(x.dtype)


def _conv_eval(x, p, pad=1):
    """Conv2dTorch eval (NHWC bf16)."""
    w = p["kernel"].astype(_BF)
    y = lax.conv_general_dilated(
        x.astype(_BF), w, (1, 1), [(pad, pad)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + p["bias"].astype(_BF)


def _bn_eval(x, bn_p, bn_s):
    s, t = _bn_affine(bn_p["BatchNorm_0"], bn_s["BatchNorm_0"])
    return (x.astype(jnp.float32) * s + t).astype(_BF)


def _deconv_eval(x, p):
    """ConvTranspose2dTorch eval (k3 s2 p1 op1 -> exactly 2x upsample)."""
    w = p["kernel"].astype(_BF)  # (k, k, out, in)
    b = p["bias"].astype(_BF)
    y = lax.conv_general_dilated(
        x.astype(_BF), jnp.flip(w, axis=(0, 1)), (1, 1),
        padding=((1, 2), (1, 2)), lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWOI", "NHWC"))
    return y + b


def _crc_packed(xq, p, s, act, c, wq, interpret=False):
    """ConvResidualConv on the packed layout (FusionNet block); the
    residual add fuses into the conv_2 tail conv's epilogue."""
    c1 = _cb(xq, p["conv_1"], s["conv_1"], act, c, wq, interpret)
    h = _cb(c1, p["conv_2"]["block0"], s["conv_2"]["block0"], act, c, wq,
            interpret)
    h = _cb(h, p["conv_2"]["block1"], s["conv_2"]["block1"], act, c, wq,
            interpret)
    r, sc, sh = _packed_conv_args(p["conv_2"]["conv"]["Conv_0"],
                                  p["conv_2"]["bn"]["BatchNorm_0"],
                                  s["conv_2"]["bn"]["BatchNorm_0"], c)
    res = conv3x3_packed(h, r, sc, sh, None, wq=wq, residual=c1,
                         interpret=interpret)
    return _cb(res, p["conv_3"], s["conv_3"], act, c, wq, interpret)


def _crc_xla(x, p, s, act_fn):
    """ConvResidualConv on XLA (smaller levels)."""
    def cb(h, pp, ss, act=True):
        h = _bn_eval(_conv_eval(h, pp["conv"]["Conv_0"]),
                     pp["bn"], ss["bn"])
        return act_fn(h) if act else h
    c1 = cb(x, p["conv_1"], s["conv_1"])
    h = cb(c1, p["conv_2"]["block0"], s["conv_2"]["block0"])
    h = cb(h, p["conv_2"]["block1"], s["conv_2"]["block1"])
    c2 = _bn_eval(_conv_eval(h, p["conv_2"]["conv"]["Conv_0"]),
                  p["conv_2"]["bn"], s["conv_2"]["bn"])
    return cb(c1 + c2, p["conv_3"], s["conv_3"])


def _deconv_packed(xq, p, s, c_in, wq, residual=None, act="relu",
                   res_mode="post_act_half", interpret=False):
    """Fused packed ConvTranspose(k3 s2) + eval BN + act (+ skip composite).

    c_in -> c_in/2 channels, 2x spatial; quad count is preserved."""
    from sstem_tpu.kernels.deconv import (
        build_packed_deconv_weights, deconv2x_packed)

    c_out = c_in // 2
    w = p["deconv"]["kernel"].astype(_BF)
    b = p["deconv"]["bias"]
    bs, bt = _bn_affine(p["bn"]["BatchNorm_0"], s["bn"]["BatchNorm_0"])
    r = build_packed_deconv_weights(w, c_in)
    sc, sh = fold_affine(c_out, b, bs, bt)
    return deconv2x_packed(xq, r, sc, sh, act=act, wq=wq,
                           residual=residual, res_mode=res_mode,
                           interpret=interpret)


def _maxpool(x):
    return lax.reduce_window(x, -jnp.inf, lax.max, (1, 2, 2, 1),
                             (1, 2, 2, 1), "VALID")


# ---------------------------------------------------------------------------
# FusionNet
# ---------------------------------------------------------------------------

def fusionnet_serve(variables, x, output_nc=2, ngf=32, interpret=False):
    """Eval-mode FusionNet forward, packed at levels 1 (C=32 @ full res)
    and 2 (C=64 @ half res). Matches FusionNet.apply(train=False) at bf16
    tolerance."""
    assert ngf == 32, "packed serving supports the reference ngf=32"
    p = variables["params"]
    s = variables["batch_stats"]
    n, h, w, _ = x.shape
    if x.shape[-1] == 2:  # replicated-gray pair input (exact fold)
        p = _with_folded_first_conv(
            p, ("down_1", "conv_1", "conv", "Conv_0"))
    wq1, wq2x = w // 4, (w // 2) // 2  # quads at L1 (P=4), L2 (P=2)

    from sstem_tpu.kernels.pool import pool2x_packed

    # L1 encoder (packed, C=32; 6-channel input zero-padded into packing)
    xq = pack_nhwc(x.astype(_BF), pad_c=32 - x.shape[-1])
    d1q = _crc_packed(xq, p["down_1"], s["down_1"], "leaky", 32, wq1,
                      interpret)

    # L2 encoder (packed, C=64): the packed pool emits the C=64 layout
    p1q = pool2x_packed(d1q, 32, "max", wq=wq1, interpret=interpret)
    d2q = _crc_packed(p1q, p["down_2"], s["down_2"], "leaky", 64, wq2x,
                      interpret)
    down_2 = unpack_nhwc(d2q, 64, w // 2)
    p2 = _maxpool(down_2)

    # L3/L4/bridge (XLA)
    down_3 = _crc_xla(p2, p["down_3"], s["down_3"], _leaky)
    p3 = _maxpool(down_3)
    down_4 = _crc_xla(p3, p["down_4"], s["down_4"], _leaky)
    p4 = _maxpool(down_4)
    bridge = _crc_xla(p4, p["bridge"], s["bridge"], _leaky)

    relu = lambda t: jnp.maximum(t, 0).astype(t.dtype)

    def deconv_block(h, name):
        h = _deconv_eval(h, p[name]["deconv"])
        return relu(_bn_eval(h, p[name]["bn"], s[name]["bn"]))

    up_1 = _crc_xla((deconv_block(bridge, "deconv_1") + down_4) / 2,
                    p["up_1"], s["up_1"], relu)
    up_2 = _crc_xla((deconv_block(up_1, "deconv_2") + down_3) / 2,
                    p["up_2"], s["up_2"], relu)

    # L2 decoder: fused packed deconv (128 -> 64 @ 320 -> 640) with the
    # (act(bn(deconv)) + skip) / 2 composite in the epilogue
    u3_in_q = _deconv_packed(
        pack_nhwc(up_2.astype(_BF)), p["deconv_3"], s["deconv_3"], 128,
        wq2x, residual=d2q, interpret=interpret)
    u3q = _crc_packed(u3_in_q, p["up_3"], s["up_3"], "relu", 64, wq2x,
                      interpret)

    # L1 decoder: fused packed deconv (64 -> 32 @ 640 -> 1280) + skip
    u4_in_q = _deconv_packed(u3q, p["deconv_4"], s["deconv_4"], 64, wq1,
                             residual=d1q, interpret=interpret)
    u4q = _crc_packed(u4_in_q, p["up_4"], s["up_4"], "relu", 32, wq1,
                      interpret)
    r, sc, sh = _packed_conv_args(p["out"]["Conv_0"], None, None, 32)
    outq = conv3x3_packed(u4q, r, sc, sh, None, wq=wq1, interpret=interpret)
    return unpack_nhwc(outq, 32, w)[..., :output_nc]


# ---------------------------------------------------------------------------
# UNetSFF
# ---------------------------------------------------------------------------

def _contract_packed(xq, p, s, c, wq, interpret=False):
    h = _cb(xq, {"conv": p["conv0"], "bn": p["bn0"]},
            {"bn": s["bn0"]}, "relu", c, wq, interpret)
    return _cb(h, {"conv": p["conv1"], "bn": p["bn1"]},
               {"bn": s["bn1"]}, "relu", c, wq, interpret)


def _split_concat_conv_packed(aq, bq, conv_p, bn_p, bn_s, c, ca, wq,
                              interpret=False):
    """conv(concat(a, b)) + BN + ReLU via weight split; a carries the first
    ca in-channels, b the rest; both packed at C=c. Returns packed output
    with the zero-border invariant restored."""
    w = conv_p["kernel"]
    wa = {"kernel": w[:, :, :ca], "bias": conv_p["bias"]}
    wb = {"kernel": w[:, :, ca:], "bias": jnp.zeros_like(conv_p["bias"])}
    ra, sca, sha = _packed_conv_args(wa, None, None, c)
    ya = conv3x3_packed(aq, ra, sca, sha, None, wq=wq, interpret=interpret)
    sbn, tbn = _bn_affine(bn_p["BatchNorm_0"], bn_s["BatchNorm_0"])
    rb = build_packed_weights(
        jnp.pad(wb["kernel"].astype(_BF),
                [(0, 0), (0, 0), (0, 0), (0, c - w.shape[3])])
        if w.shape[3] < c else wb["kernel"].astype(_BF), _LANES // c)
    scb, shb = fold_affine(c, None, sbn, tbn)
    # conv_b folds BN + relu; conv_a's (bias-carrying) output joins the
    # accumulator before the affine
    return conv3x3_packed(bq, rb, scb, shb, "relu", wq=wq, residual=ya,
                          residual_pre_affine=True, interpret=interpret)


def unet_sff_serve(variables, x, out_channel=1, interpret=False):
    """Eval-mode UNetSFF forward; encode1/final packed at C=32 full res,
    encode2/decode2-convs packed at C=64 half res; rest XLA."""
    p = variables["params"]
    s = variables["batch_stats"]
    n, h, w, _ = x.shape
    if x.shape[-1] == 2:  # replicated-gray pair input (exact fold)
        p = _with_folded_first_conv(p, ("conv_encode1", "conv0", "Conv_0"))
    wq1, wq2x = w // 4, (w // 2) // 2
    relu = lambda t: jnp.maximum(t, 0).astype(t.dtype)

    from sstem_tpu.kernels.pool import pool2x_packed

    xq = pack_nhwc(x.astype(_BF), pad_c=32 - x.shape[-1])
    e1q = _contract_packed(xq, p["conv_encode1"], s["conv_encode1"], 32,
                           wq1, interpret)

    e2q = _contract_packed(pool2x_packed(e1q, 32, "max", wq=wq1,
                                         interpret=interpret),
                           p["conv_encode2"], s["conv_encode2"], 64, wq2x,
                           interpret)
    e2 = unpack_nhwc(e2q, 64, w // 2)
    p2 = _maxpool(e2)

    def cb_xla(h, cp, bp, bs):
        return relu(_bn_eval(_conv_eval(h, cp["Conv_0"]), bp, bs))

    e3 = cb_xla(p2, p["conv_encode3"]["conv0"], p["conv_encode3"]["bn0"],
                s["conv_encode3"]["bn0"])
    e3 = cb_xla(e3, p["conv_encode3"]["conv1"], p["conv_encode3"]["bn1"],
                s["conv_encode3"]["bn1"])
    p3 = _maxpool(e3)

    b = cb_xla(p3, p["bottleneck_conv0"], p["bottleneck_bn0"],
               s["bottleneck_bn0"])
    b = cb_xla(b, p["bottleneck_conv1"], p["bottleneck_bn1"],
               s["bottleneck_bn1"])
    b = _deconv_eval(b, p["bottleneck_deconv"])
    b = relu(_bn_eval(b, p["bottleneck_bn2"], s["bottleneck_bn2"]))

    # decode3: concat(b, e3) -> conv 256->128, conv 128->128 (XLA @ 320),
    # then fused packed deconv 128->64 @ 320 -> 640
    d3 = jnp.concatenate([b, e3.astype(b.dtype)], axis=-1)
    c2 = cb_xla(d3, p["conv_decode3"]["conv0"], p["conv_decode3"]["bn0"],
                s["conv_decode3"]["bn0"])
    c2 = cb_xla(c2, p["conv_decode3"]["conv1"], p["conv_decode3"]["bn1"],
                s["conv_decode3"]["bn1"])
    c2q = _deconv_packed(
        pack_nhwc(c2.astype(_BF)),
        {"deconv": p["conv_decode3"]["deconv"],
         "bn": p["conv_decode3"]["bn2"]},
        {"bn": s["conv_decode3"]["bn2"]}, 128, wq2x, interpret=interpret)

    # decode2 (packed @ 640): conv(concat(c2, e2)) 128->64 via weight split
    h64q = _split_concat_conv_packed(
        c2q, e2q, p["conv_decode2"]["conv0"]["Conv_0"],
        p["conv_decode2"]["bn0"], s["conv_decode2"]["bn0"], 64, 64, wq2x,
        interpret)
    h64q = _cb(h64q,
               {"conv": p["conv_decode2"]["conv1"],
                "bn": p["conv_decode2"]["bn1"]},
               {"bn": s["conv_decode2"]["bn1"]}, "relu", 64, wq2x, interpret)
    # fused packed deconv 64->32 @ 640 -> 1280
    c1q = _deconv_packed(
        h64q,
        {"deconv": p["conv_decode2"]["deconv"],
         "bn": p["conv_decode2"]["bn2"]},
        {"bn": s["conv_decode2"]["bn2"]}, 64, wq1, interpret=interpret)

    # final (packed @ full res): conv(concat(c1, e1)) 64->32 via split
    f = _split_concat_conv_packed(
        c1q, e1q, p["final_conv0"]["Conv_0"], p["final_bn0"],
        s["final_bn0"], 32, 32, wq1, interpret)
    fq = _cb(f, {"conv": p["final_conv1"], "bn": p["final_bn1"]},
             {"bn": s["final_bn1"]}, "relu", 32, wq1, interpret)
    return unpack_nhwc(fq, 32, w)[..., :out_channel]


# ---------------------------------------------------------------------------
# IFNet (SFF/SP kernel-prediction net)
# ---------------------------------------------------------------------------

def _conv_module_packed(xq, p, c, wq, interpret=False):
    """IFNet _ConvModule (3x conv+relu, no BN) on the packed layout."""
    out = xq
    for name in ("conv0", "conv1", "conv2"):
        r, sc, sh = _packed_conv_args(p[name]["Conv_0"], None, None, c)
        out = conv3x3_packed(out, r, sc, sh, "relu", wq=wq,
                             interpret=interpret)
    return out


def _conv_module_xla(x, p):
    h = x
    for name in ("conv0", "conv1", "conv2"):
        h = jnp.maximum(_conv_eval(h, p[name]["Conv_0"]), 0).astype(_BF)
    return h


def _upsample_module_xla(x, p, out_hw=None):
    from sstem_tpu.ops import upsample_bilinear_align_corners

    h = upsample_bilinear_align_corners(x.astype(_BF), 2, out_hw=out_hw)
    return jnp.maximum(_conv_eval(h, p["conv"]["Conv_0"]), 0).astype(_BF)


def ifnet_serve(variables, x, kernel_size=51, n_frames=1, assume_gray=True,
                interpret=False):
    """Eval-mode IFNet forward: packed convs at full res (conv32 module)
    and half res (conv64 / upconv64 / upsamp64 / head conv0-2), the planar
    upsample + conv3 + Pallas sepconv tail of models/ifnet.py (packed=True)
    unchanged. Matches IFNet.apply at bf16 tolerance.

    Reference: sff_scripts_interp/model/model_interp.py:55-107 (SFF) and
    sp_scripts_train/networks.py:68-129 (SP 2-frame).

    ``x`` may be the reference 6-channel replicated-gray pair OR the
    2-channel gray pair directly: conv32's first conv is pair-folded
    (fold_gray_pair_conv, exact on replicated inputs), which drops the
    f32 6-channel glue tensor between the uint8 stack and the packed
    trunk (PERFORMANCE.md round-4 glue cut)."""
    from sstem_tpu.config import matmul_precision
    from sstem_tpu.kernels import sepconv_planar
    from sstem_tpu.ops import replication_pad_2d, upsample2x_planar_mxu

    p = variables["params"]
    n, h, w, _ = x.shape
    if x.shape[-1] == 2:
        assert assume_gray, "2-channel input implies gray frames"
        p = _with_folded_first_conv(p, ("conv32", "conv0", "Conv_0"))
        i1 = x[..., 0:1]
        i2 = x[..., 1:2]
    else:
        i1 = x[..., 0:3]
        i2 = x[..., 3:6]
    wq1, wq2x = w // 4, (w // 2) // 2

    from sstem_tpu.kernels.pool import pool2x_packed

    # ---- contraction (packed through the half-res level; the packed avg
    # pool emits the C=64 layout the conv64 module consumes) ----
    xq = pack_nhwc(x.astype(_BF), pad_c=32 - x.shape[-1])
    x32q = _conv_module_packed(xq, p["conv32"], 32, wq1, interpret=interpret)
    p1q = pool2x_packed(x32q, 32, "avg", wq=wq1, interpret=interpret)
    x64q = _conv_module_packed(p1q, p["conv64"], 64, wq2x,
                               interpret=interpret)
    x64 = unpack_nhwc(x64q, 64, w // 2)

    def avg_pool(t):
        return (lax.reduce_window(
            t.astype(jnp.float32), 0.0, lax.add, (1, 2, 2, 1), (1, 2, 2, 1),
            "VALID") * 0.25).astype(_BF)

    x128 = _conv_module_xla(avg_pool(x64), p["conv128"])
    x256 = _conv_module_xla(avg_pool(x128), p["conv256"])
    x512 = _conv_module_xla(avg_pool(x256), p["conv512"])
    xb = _conv_module_xla(avg_pool(x512), p["conv512x512"])

    # ---- expansion (additive skips) ----
    xb = _upsample_module_xla(xb, p["upsamp512"],
                              out_hw=x512.shape[1:3]) + x512
    xb = _conv_module_xla(xb, p["upconv256"])
    xb = _upsample_module_xla(xb, p["upsamp256"],
                              out_hw=x256.shape[1:3]) + x256
    xb = _conv_module_xla(xb, p["upconv128"])
    xb = _upsample_module_xla(xb, p["upsamp128"],
                              out_hw=x128.shape[1:3]) + x128
    xb = _conv_module_xla(xb, p["upconv64"])  # 128 -> 64 at quarter res
    # half-res level packed: upsample to W/2, conv 64->64, skip from x64
    from sstem_tpu.ops import upsample_bilinear_align_corners
    up = upsample_bilinear_align_corners(
        xb, 2, out_hw=x64.shape[1:3]).astype(_BF)
    r, sc, sh = _packed_conv_args(p["upsamp64"]["conv"]["Conv_0"], None,
                                  None, 64)
    upq = conv3x3_packed(pack_nhwc(up), r, sc, sh, "relu", wq=wq2x,
                         interpret=interpret)
    featq = upq + x64q  # additive skip, packed

    # ---- kernel heads (conv0-2 packed; planar upsample+conv3+sepconv) ----
    pad = kernel_size // 2
    if assume_gray:
        i1 = i1[..., 0:1]  # no-op for the 2-channel input
        i2 = i2[..., 0:1]
    padded_i1 = replication_pad_2d(i1, pad).astype(_BF)
    padded_i2 = replication_pad_2d(i2, pad).astype(_BF)
    padded_i1 = jnp.transpose(padded_i1, (0, 3, 1, 2))
    padded_i2 = jnp.transpose(padded_i2, (0, 3, 1, 2))

    def head_half(hp, full64=False):
        hq = featq
        for name in ("conv0", "conv1"):
            rr, ss, hh = _packed_conv_args(hp[name]["Conv_0"], None, None, 64)
            hq = conv3x3_packed(hq, rr, ss, hh, "relu", wq=wq2x,
                                interpret=interpret)
        rr, ss, hh = _packed_conv_args(hp["conv2"]["Conv_0"], None, None, 64)
        hq = conv3x3_packed(hq, rr, ss, hh, "relu", wq=wq2x,
                            interpret=interpret)
        half = unpack_nhwc(hq, 64, w // 2)
        # channels >= kernel_size are exactly zero: the packed conv2 pads
        # its weights/bias with zeros and relu(0) == 0.
        return half if full64 else half[..., :kernel_size]

    def head(hp):
        # planar tail: (N, K, H/2, W/2) -> upsample -> conv3 (NCHW).
        # A fused packed upsample+conv3 alternative (r3-r4
        # kernels/upconv3x3.py) was hardware-A/B'd on 2026-08-18 and
        # LOST: 16.43 vs 13.20 ms/section/head (PERFORMANCE.md round-4);
        # it was deleted per VERDICT r3 item 6.
        hp_pl = jnp.transpose(head_half(hp), (0, 3, 1, 2))
        w3 = hp["conv3"]["Conv_0"]["kernel"].astype(_BF)
        b3 = hp["conv3"]["Conv_0"]["bias"].astype(_BF)
        hp_pl = upsample2x_planar_mxu(hp_pl, precision=matmul_precision())
        y = lax.conv_general_dilated(
            hp_pl, w3, (1, 1), [(1, 1)] * 2,
            dimension_numbers=("NCHW", "HWIO", "NCHW"),
            precision=matmul_precision())
        return y + b3[None, :, None, None]

    def batched_tails(hps):
        """ALL head tails as ONE upsample + ONE grouped conv3.

        The per-head XLA conv3 (K~51 channels at full res) runs in the
        rig's worst conv regime (~30-45 GB/s effective; small-channel
        full-res convs as low as ~6 GB/s — PERFORMANCE.md). Stacking the
        G heads channel-wise and using feature_group_count=G keeps each
        head's weights separate (group g reads input channels
        [g*K:(g+1)*K] and writes output channels [g*K:(g+1)*K]) while
        giving XLA one G*K-channel conv + one upsample einsum pair
        instead of G small ones. Bit-identical math to head()."""
        k = kernel_size
        maps = jnp.concatenate([head_half(hp) for hp in hps], axis=-1)
        pl = jnp.transpose(maps, (0, 3, 1, 2))
        pl = upsample2x_planar_mxu(pl, precision=matmul_precision())
        w3 = jnp.concatenate(
            [hp["conv3"]["Conv_0"]["kernel"] for hp in hps],
            axis=-1).astype(_BF)
        b3 = jnp.concatenate(
            [hp["conv3"]["Conv_0"]["bias"] for hp in hps]).astype(_BF)
        y = lax.conv_general_dilated(
            pl, w3, (1, 1), [(1, 1)] * 2,
            dimension_numbers=("NCHW", "HWIO", "NCHW"),
            feature_group_count=len(hps), precision=matmul_precision())
        y = y + b3[None, :, None, None]
        return [y[:, g * k:(g + 1) * k] for g in range(len(hps))]

    def head_fused(hp):
        """Pallas phase-decomposed upsample+conv3 (kernels/head_tail.py):
        the half-res features go channels-in-sublanes, the tail runs as 6
        MXU matmuls per row block, and the phase-planar maps are de-phased
        by one fused XLA copy. Exactness vs head() is gated on hardware
        (tools/tpu_checks.py)."""
        from sstem_tpu.kernels.head_tail import (dephase_transpose,
                                                 head_tail_fused)
        hx = jnp.transpose(head_half(hp, full64=True), (0, 1, 3, 2))
        w3 = hp["conv3"]["Conv_0"]["kernel"]
        b3 = hp["conv3"]["Conv_0"]["bias"]
        m = head_tail_fused(hx.astype(_BF), w3, b3, interpret=interpret)
        return dephase_transpose(m, w // 2)

    head_names = []
    for f in range(n_frames):
        sfx = "" if n_frames == 1 else f"_f{f + 1}"
        head_names += [f"head2h{sfx}", f"head2v{sfx}",
                       f"head1h{sfx}", f"head1v{sfx}"]
    fused_ok = (w // 2) % 128 == 0 and (h // 2) % 4 == 0
    if os.environ.get("SSTEM_FUSED_HEAD_TAIL", "0") == "1" and fused_ok:
        tails = [head_fused(p[nm]) for nm in head_names]
    elif os.environ.get("SSTEM_BATCHED_HEAD_TAIL", "0") == "1":
        tails = batched_tails([p[nm] for nm in head_names])
    else:
        tails = [head(p[nm]) for nm in head_names]

    outs = []
    for f in range(n_frames):
        k2h, k2v, k1h, k1v = tails[4 * f:4 * f + 4]
        y = sepconv_planar(padded_i2, k2v, k2h) + sepconv_planar(
            padded_i1, k1v, k1h)
        y = jnp.transpose(y, (0, 2, 3, 1))
        if not assume_gray:
            y = jnp.mean(y, axis=-1, keepdims=True)
        outs.append(y)
    out = jnp.concatenate(outs, axis=-1) if len(outs) > 1 else outs[0]
    return out.astype(jnp.float32)


# ---------------------------------------------------------------------------
# SP U-Nets (milesial backbone; UNetSP denoiser + additive FusionNetSP)
# ---------------------------------------------------------------------------

def _double_conv_packed(xq, p, s, c, wq, cout_pad=None, interpret=False):
    """DoubleConv (conv+BN+relu x2) packed; conv1's real out channels may be
    fewer than the packing (cout_pad) — the pad slots stay zero."""
    h = _cb(xq, {"conv": p["conv0"], "bn": p["bn0"]}, {"bn": s["bn0"]},
            "relu", c, wq, interpret)
    return _cb(h, {"conv": p["conv1"], "bn": p["bn1"]}, {"bn": s["bn1"]},
               "relu", c, wq, interpret)


def _split_dc_packed(aq, bq, p, s, c, ca, wq, interpret=False):
    """DoubleConv whose conv0 consumes concat([a, b]) via weight split."""
    h = _split_concat_conv_packed(aq, bq, p["conv0"]["Conv_0"], p["bn0"],
                                  s["bn0"], c, ca, wq, interpret)
    return _cb(h, {"conv": p["conv1"], "bn": p["bn1"]}, {"bn": s["bn1"]},
               "relu", c, wq, interpret)


def _conv1x1_packed(xq, conv_p, c, wq, interpret=False):
    """1x1 conv as a center-tap-only packed conv3x3."""
    w1 = conv_p["kernel"]  # (1, 1, cin, cout)
    w3 = jnp.pad(w1, [(1, 1), (1, 1), (0, 0), (0, 0)])
    r, sc, sh = _packed_conv_args({"kernel": w3, "bias": conv_p["bias"]},
                                  None, None, c)
    return conv3x3_packed(xq, r, sc, sh, None, wq=wq, interpret=interpret)


def unet_sp_backbone_serve(variables, x, n_classes=1, prefix="backbone",
                           interpret=False):
    """Eval-mode milesial U-Net forward (sp_scripts_train/networks.py:
    243-273) with packed conv levels 1 (C=64 @ full res) and 2 (C=128 @
    half res); deeper levels and the bilinear upsamplings stay on XLA."""
    from sstem_tpu.kernels.pool import pool2x_packed
    from sstem_tpu.ops import upsample_bilinear_align_corners

    p = variables["params"][prefix]
    s = variables["batch_stats"][prefix]
    n, h, w, cin = x.shape
    wq1 = w // 2          # C=64 -> P=2
    relu = lambda t: jnp.maximum(t, 0).astype(t.dtype)

    # inc (1 -> 64 @ full res, packed)
    xq = pack_nhwc(x.astype(_BF), pad_c=64 - cin)
    x1q = _double_conv_packed(xq, p["inc"], s["inc"], 64, wq1,
                              interpret=interpret)

    # down1: packed pool emits the C=128 layout; DoubleConv(128) @ half res
    x2q = _double_conv_packed(
        pool2x_packed(x1q, 64, "max", wq=wq1, interpret=interpret),
        p["down1"]["conv"], s["down1"]["conv"], 128, wq1,
        interpret=interpret)
    x2 = unpack_nhwc(x2q, 128, w // 2)

    # down2..down4 + up1 + up2 (XLA at <= quarter res)
    def dc_xla(t, pp, ss):
        t = relu(_bn_eval(_conv_eval(t, pp["conv0"]["Conv_0"]),
                          pp["bn0"], ss["bn0"]))
        return relu(_bn_eval(_conv_eval(t, pp["conv1"]["Conv_0"]),
                             pp["bn1"], ss["bn1"]))

    x3 = dc_xla(_maxpool(x2), p["down2"]["conv"], s["down2"]["conv"])
    x4 = dc_xla(_maxpool(x3), p["down3"]["conv"], s["down3"]["conv"])
    x5 = dc_xla(_maxpool(x4), p["down4"]["conv"], s["down4"]["conv"])

    def up_xla(t, skip, pp, ss):
        t = upsample_bilinear_align_corners(t.astype(_BF), 2,
                                            out_hw=skip.shape[1:3])
        return dc_xla(jnp.concatenate([skip, t], -1), pp["conv"],
                      ss["conv"])

    u = up_xla(x5, x4, p["up1"], s["up1"])
    u = up_xla(u, x3, p["up2"], s["up2"])

    # up3 (@ half res, packed): concat [x2 (128), upsampled u (128)]
    u_half = upsample_bilinear_align_corners(
        u.astype(_BF), 2, out_hw=(h // 2, w // 2))
    u3q = _split_dc_packed(x2q, pack_nhwc(u_half), p["up3"]["conv"],
                           s["up3"]["conv"], 128, 128, wq1,
                           interpret=interpret)

    # up4 (@ full res, packed): concat [x1 (64), upsampled up3-real (64)]
    u_full = upsample_bilinear_align_corners(
        unpack_nhwc(u3q, 128, w // 2)[..., :64], 2, out_hw=(h, w))
    u4q = _split_dc_packed(x1q, pack_nhwc(u_full), p["up4"]["conv"],
                           s["up4"]["conv"], 64, 64, wq1,
                           interpret=interpret)

    outq = _conv1x1_packed(u4q, p["outc"]["Conv_0"], 64, wq1,
                           interpret=interpret)
    return unpack_nhwc(outq, 64, w)[..., :n_classes].astype(jnp.float32)


def unet_sp_serve(variables, x, n_classes=1, interpret=False):
    """UNetSP (denoiser) packed serving; matches UNetSP.apply(train=False)
    at bf16 tolerance."""
    return unet_sp_backbone_serve(variables, x, n_classes,
                                  interpret=interpret)


def fusionnet_sp_serve(variables, x1, x2, n_classes=1, interpret=False):
    """FusionNetSP packed serving: inputs added first (networks.py:295)."""
    return unet_sp_backbone_serve(variables, x1 + x2, n_classes,
                                  interpret=interpret)


# ---------------------------------------------------------------------------
# replicated-gray input folding
# ---------------------------------------------------------------------------

def fold_gray_pair_conv(conv_p):
    """Fold a 6-channel first conv into 2 channels for replicated-gray
    inputs: the pipelines always feed [gray x3, other x3]
    (data_provider.py:132-141), so conv(w6, x6) == conv(w2, x2) with
    w2[..., 0, :] = sum(w6[..., 0:3, :]) and likewise for 3:6 — exact."""
    w = conv_p["kernel"]
    assert w.shape[2] == 6
    w2 = jnp.stack([w[:, :, 0:3].sum(2), w[:, :, 3:6].sum(2)], axis=2)
    return {"kernel": w2, "bias": conv_p["bias"]}


def _with_folded_first_conv(p, path):
    """Shallow-copy the param tree with conv at ``path`` pair-folded."""
    node = p
    copies = []
    for key in path[:-1]:
        copies.append((node, key))
        node = node[key]
    folded = fold_gray_pair_conv(node[path[-1]])
    new = {**node, path[-1]: folded}
    for parent, key in reversed(copies):
        new = {**parent, key: new}
    return new
