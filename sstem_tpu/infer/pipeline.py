"""End-to-end restoration pipelines (SFF and SP), fused per-section on device.

The reference chains separate processes through files on disk
(interp inference -> unfolding/fusion inference, SURVEY §3.2). Here each
stage composition is ONE jitted function per section — interp, flow, warp,
fusion and the stitching composite all stay on device; only uint8 images
cross the host boundary.

Reference semantics preserved (sff_scripts_fusion/inference.py:112-201):
  * models run in eval mode (running BN stats)
  * inputs are [degraded x3ch ++ interp x3ch] / 255
  * warp is the zero-border spatial transform
  * stitching composite: m = (warped_uint8 >= 2); interp*(1-m) + warped*m
"""

from dataclasses import dataclass
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from sstem_tpu.models import FusionNet, IFNet, UNetSFF, UNetSP, FusionNetSP
from sstem_tpu.models.serving import (
    fusionnet_serve,
    ifnet_serve,
    unet_sff_serve,
)
from sstem_tpu.ops import spatial_transform
from sstem_tpu.kernels.warp_band import serving_warp
from sstem_tpu.infer.tiles import pad_to_multiple


def _check_interior(damaged_ids, z):
    """Damaged sections need both z-neighbors: the eager path's stack[i-1]
    would silently wrap id 0 to the LAST section while the scanned path's
    traced ix-1 clamps to 0 — divergent, both wrong. Reject boundary ids in
    one place instead (ADVICE r4)."""
    bad = [int(i) for i in damaged_ids if not 0 < int(i) < z - 1]
    if bad:
        raise ValueError(
            f"damaged_ids {bad} lack a z-neighbor in a {z}-section stack; "
            "interp needs sections k-1 and k+1 (pad the stack or drop the "
            "boundary sections)")


def _to01(img):
    return jnp.asarray(img, jnp.float32) / 255.0


def _gray6(a, b):
    """Two gray (N, H, W) images -> (N, H, W, 6) replicated-channel input."""
    return jnp.concatenate(
        [jnp.repeat(a[..., None], 3, -1), jnp.repeat(b[..., None], 3, -1)],
        axis=-1,
    )


@dataclass
class SFFPipeline:
    """interp (KPN) -> unfolding flow -> warp -> fusion U-Net -> stitch."""

    interp_vars: dict
    flow_vars: Optional[dict] = None
    fusion_vars: Optional[dict] = None
    kernel_size: int = 51
    ngf: int = 32
    pad: int = 0  # cfg.TEST.pad parity: symmetric zero pad before the model,
                  # negative pad (crop) after (main_ms.py:186-191)
    packed: bool = True  # planar-map IFNet path (identical function,
                         # ~1.7x faster on TPU; see models/ifnet.py)
    packed_conv: Optional[bool] = None  # pixel-packed Pallas conv serving
        # for FusionNet/UNetSFF (models/serving.py); None = auto (TPU only)

    def __post_init__(self):
        if self.packed_conv is None:
            self.packed_conv = jax.default_backend() == "tpu"
        if self.ngf != 32:
            self.packed_conv = False  # packed serving targets reference ngf
        self.interp_model = IFNet(kernel_size=self.kernel_size, n_frames=1,
                                  packed=self.packed)
        self.flow_model = FusionNet(output_nc=2, ngf=self.ngf)
        self.fusion_model = UNetSFF(out_channel=1)

        def interp_fn(variables, x):
            # packed-conv serving path (packed trunk/head convs + packed
            # avg pool feeding conv64 its layout directly): ~4% faster
            # than the flax planar-packed path at 1280^2
            # (tools/ifnet_prefix_bench.py; PERFORMANCE.md)
            if self.packed_conv:
                return ifnet_serve(variables, x,
                                   kernel_size=self.kernel_size, n_frames=1)
            return self.interp_model.apply(variables, x)

        def restore_fn(flow_v, fusion_v, inputs):
            if self.packed_conv:
                # replicated-gray channels fold into 2-channel inputs
                # (serving.fold_gray_pair_conv — exact), skipping the
                # 6-channel f32 glue tensors; inputs may already BE the
                # 2-channel [deg, interp] pair (fused section path)
                x2 = inputs if inputs.shape[-1] == 2 else inputs[..., 0::3]
                flow = fusionnet_serve(flow_v, x2, output_nc=2,
                                       ngf=self.ngf).astype(jnp.float32)
                # banded Pallas warp (kernels/warp_band.py): 8.8 vs
                # 21.8 ms/section measured; exactness-checked XLA
                # fallback keeps arbitrary flows correct
                warped1 = serving_warp(x2[..., 0:1], flow)
                fused2 = jnp.concatenate([warped1, x2[..., 1:2]], -1)
                pred = unet_sff_serve(fusion_v, fused2,
                                      out_channel=1).astype(jnp.float32)
                # warped stays single-channel (it is gray); consumers
                # reduce with mean(-1), for which 1ch == replicated 3ch
                return pred, flow, warped1
            flow = self.flow_model.apply(flow_v, inputs, train=False)
            # the degraded channels are gray replicated x3 — warp once
            warped1 = spatial_transform(inputs[..., 0:1], flow)
            warped = jnp.repeat(warped1, 3, axis=-1)
            fused_in = jnp.concatenate([warped, inputs[..., 3:6]], axis=-1)
            pred = self.fusion_model.apply(fusion_v, fused_in,
                                           train=False)
            return pred, flow, warped

        def section_fn(iv, fv, uv, x3):
            """Fused per-section restore on a [prev, next, deg] channel
            stack (N, H, W, 3) in 0..1 -> (N, H, W, 5):
            [interp, fused, warped, flow_y, flow_x]. Spatially local and
            shape-preserving, so it can be row-sharded by spatial_apply."""
            if self.packed_conv:
                # 2-channel end-to-end: no replicated-gray f32 glue
                # tensors between the stages (exact weight folds inside
                # ifnet_serve / fusionnet_serve)
                interp = jnp.clip(interp_fn(iv, x3[..., 0:2])[..., 0],
                                  0.0, 1.0)
                xr = jnp.stack([x3[..., 2], interp], axis=-1)
            else:
                interp = jnp.clip(
                    interp_fn(iv, _gray6(x3[..., 0], x3[..., 1]))[..., 0],
                    0.0, 1.0)
                xr = _gray6(x3[..., 2], interp)
            pred, flow, warped = restore_fn(fv, uv, xr)
            warped_g = jnp.mean(warped, axis=-1)
            return jnp.concatenate(
                [interp[..., None], pred, warped_g[..., None], flow], -1)

        self._interp_fn = jax.jit(interp_fn)
        self._restore_fn = jax.jit(restore_fn)
        self._section_fn = section_fn

        def stack_fn(iv, fv, uv, stack_p, idx):
            """One dispatch for the whole damaged set: ``lax.map`` over
            (G, B) z-index groups, neighbor gather + per-section restore +
            stitch + uint8 quantization all on device. Per-group working
            set stays at the batch-B HBM sweet spot; the host pays ONE
            pytree dispatch instead of G (measured ~5 ms/section at
            1250^2, PERFORMANCE.md round 4)."""
            def one_group(ix):
                x3 = jnp.stack(
                    [stack_p[ix - 1], stack_p[ix + 1], stack_p[ix]],
                    axis=-1).astype(jnp.float32) / 255.0
                out = section_fn(iv, fv, uv, x3)
                interp, fused = out[..., 0], out[..., 1]
                warped = jnp.clip(out[..., 2], 0.0, 1.0)
                flow = out[..., 3:5]
                w8 = jnp.floor(warped * 255.0)
                m = (w8 >= 2).astype(jnp.float32)
                stitch = jnp.floor(jnp.clip(interp, 0, 1) * 255.0) * (
                    1 - m) + w8 * m
                imgs = jnp.stack(
                    [jnp.floor(jnp.clip(interp, 0, 1) * 255.0),
                     jnp.floor(jnp.clip(fused, 0, 1) * 255.0),
                     w8, stitch], axis=-1).astype(jnp.uint8)
                return imgs, flow
            return jax.lax.map(one_group, idx)

        self._stack_fn = jax.jit(stack_fn)

    def interpolate(self, prev_imgs, next_imgs, clip=True):
        """Interpolate missing sections from gray uint8 neighbors (N, H, W).

        clip=False reproduces the reference interp inference, which casts
        (pred*255) to uint8 without clipping (inference.py:89)."""
        if self.packed_conv:  # gray-pair fold (exact), no 6ch glue
            x = jnp.stack([_to01(prev_imgs), _to01(next_imgs)], axis=-1)
        else:
            x = _gray6(_to01(prev_imgs), _to01(next_imgs))
        if self.pad:
            p = self.pad
            x = jnp.pad(x, [(0, 0), (p, p), (p, p), (0, 0)])
        x, (h, w) = pad_to_multiple(x, 32)
        pred = self._interp_fn(self.interp_vars, x)[:, :h, :w, 0]
        if self.pad:
            pred = pred[:, self.pad:-self.pad, self.pad:-self.pad]
        return jnp.clip(pred, 0.0, 1.0) if clip else pred

    def restore(self, degraded_imgs, interp_imgs):
        """Full correction of degraded sections given interp images.

        Args: gray (N, H, W) uint8/float arrays (0..255 / 0..1-scaled x255).
        Returns dict with 'fused', 'flow', 'warped', 'stitch' (all device
        arrays; fused/warped/stitch in 0..1).
        """
        x = _gray6(_to01(degraded_imgs), _to01(interp_imgs))
        x, (h, w) = pad_to_multiple(x, 32)
        pred, flow, warped = self._restore_fn(self.flow_vars,
                                              self.fusion_vars, x)
        pred = jnp.clip(pred[:, :h, :w, 0], 0.0, 1.0)
        flow = flow[:, :h, :w, :]
        warped_g = jnp.clip(jnp.mean(warped[:, :h, :w, :], axis=-1), 0.0, 1.0)
        # stitching composite at uint8 scale (inference.py:167-171).
        # Compose at 255-scale with NO /255*255 round trip: f32 x/255*255
        # lands just below the integer about half the time, so a floor by
        # the consumer would drop a level (stitch != its own warped at
        # m=1 pixels — caught by tools/verify_drive.py scanned-vs-loop).
        # The returned value centers each level at (k+0.5)/255 so any
        # downstream floor(x*255) recovers k exactly.
        w8 = jnp.floor(warped_g * 255.0)
        m = w8 >= 2
        i255 = jnp.asarray(interp_imgs, jnp.float32)
        i8 = jnp.floor(jnp.clip(i255, 0.0, 255.0))
        stitch8 = jnp.where(m, w8, i8)
        return {
            "fused": pred,
            "flow": flow,
            "warped": warped_g,
            "stitch": (stitch8 + 0.5) / 255.0,
        }

    # largest batch compiled as one launch: the batch-size sweep
    # (PERFORMANCE.md) shows 4 is the throughput sweet spot at 1250^2 —
    # batch 6 pushes the K=51 tap maps into a slow HBM regime and batch 8
    # blows up XLA compile — so larger requests fall back to sub-launches
    # of this size (>= 0.97x the batch-4 rate; VERDICT r2 item 7)
    MAX_COMPILED_CHUNK = 4

    def restore_stack(self, stack, damaged_ids, chunk=1,
                      max_compiled_chunk=None):
        """Restore damaged sections of a (Z, H, W) uint8 stack.

        Interp inputs are the z-neighbors (k-1, k+1); sections are processed
        ``chunk`` at a time (one compile; K=51 kernel maps at full-section
        resolution are HBM-heavy, ~1.3 GB per section), capped at
        ``max_compiled_chunk`` per launch (None = class default; pass 0 to
        disable the cap). Returns {id: {'interp', 'fused', 'stitch', ...}}
        with numpy uint8 images.
        """
        _check_interior(damaged_ids, len(stack))
        cap = (self.MAX_COMPILED_CHUNK if max_compiled_chunk is None
               else max_compiled_chunk)
        if cap and chunk > cap:
            # visible, not silent (ADVICE r3): callers asking for one big
            # launch get sub-launches of `cap` unless they opt out
            import logging
            logging.getLogger(__name__).warning(
                "restore_stack: requested chunk %d capped to %d sub-launches"
                " (the measured throughput sweet spot; pass"
                " max_compiled_chunk=0 to disable)", chunk, cap)
            chunk = cap
        # one host->HBM transfer for the whole stack (uint8; a 25x1250^2
        # stack is ~39 MB); per-section inputs are device-side slices, so
        # successive chunks pipeline behind the async dispatch queue
        dev_stack = jax.device_put(np.asarray(stack))
        results = {}
        for s in range(0, len(damaged_ids), chunk):
            ids = damaged_ids[s:s + chunk]
            if len(ids) < chunk and s > 0:
                ids = damaged_ids[len(damaged_ids) - chunk:]  # keep shape
            results.update(self._restore_ids(dev_stack, ids))
        return results

    def restore_stack_scanned(self, stack, damaged_ids, chunk=None,
                              want_flow=True):
        """Single-dispatch ``restore_stack``: the whole damaged set runs as
        ONE jitted program (``lax.map`` over groups of ``chunk`` sections)
        and images come back as device-quantized uint8 (4x less host
        transfer than the f32 pulls of ``restore_stack``).

        Semantics match ``restore_stack`` (same per-section composition;
        the interp hand-off skips its x255/255 float round trip, so
        individual pixels may differ by 1 uint8 where a value sits on a
        quantization boundary — tests/test_infer.py pins <= 1). For
        sections that are not 32-multiples there is additionally a
        right/bottom border-band regime (like the sharded path's): the
        loop path re-edge-pads the CROPPED interp for the restore stage,
        while this path keeps the interp canvas (network values in the pad
        band), so fused/stitch can deviate within the correction nets'
        receptive field of the padded edges; interp itself matches
        everywhere (identical edge-padded inputs). TEST.pad is not
        supported here; use ``restore_stack``.

        Returns {id: {'interp', 'fused', 'warped', 'stitch'[, 'flow']}}.
        """
        assert self.pad == 0, (
            "restore_stack_scanned does not support TEST.pad != 0; use "
            "restore_stack")
        chunk = chunk or self.MAX_COMPILED_CHUNK
        stack = np.asarray(stack)
        z, h, w = stack.shape
        _check_interior(damaged_ids, z)
        hp = -(-h // 32) * 32
        wp = -(-w // 32) * 32
        # edge mode matches pad_to_multiple inside interpolate/restore —
        # zero pad here would diverge over the models' receptive field at
        # non-32-multiple section sizes
        stack_p = np.pad(stack, [(0, 0), (0, hp - h), (0, wp - w)],
                         mode="edge")
        idx = []
        for s in range(0, len(damaged_ids), chunk):
            grp = list(damaged_ids[s:s + chunk])
            if len(grp) < chunk:
                grp = list(damaged_ids[-chunk:]) if len(
                    damaged_ids) >= chunk else grp + [grp[-1]] * (
                        chunk - len(grp))
            idx.append(grp)
        imgs, flow = self._stack_fn(
            self.interp_vars, self.flow_vars, self.fusion_vars,
            jnp.asarray(stack_p), jnp.asarray(np.asarray(idx, np.int32)))
        imgs = np.asarray(imgs)[:, :, :h, :w]
        results = {}
        for g, grp in enumerate(idx):
            for j, i in enumerate(grp):
                if i in results:
                    continue
                results[i] = {
                    "interp": imgs[g, j, ..., 0],
                    "fused": imgs[g, j, ..., 1],
                    "warped": imgs[g, j, ..., 2],
                    "stitch": imgs[g, j, ..., 3],
                }
                if want_flow:
                    results[i]["flow"] = np.asarray(
                        flow[g, j, :h, :w, :])
        return results

    def restore_stack_sharded(self, stack, damaged_ids, mesh, halo=256,
                              data_axis="data", space_axis="space"):
        """Multi-chip restore: sections data-parallel over ``data_axis``,
        section rows spatially sharded over ``space_axis`` (halo-exchanged
        shard_map; parallel/spatial.py).

        Row sharding follows the zero-extended-canvas semantics: results
        equal the fused pipeline run on the halo-padded canvas, cropped.
        Three accuracy regimes, pinned by tests/test_pipeline_sharded.py:

        * seams: for the correction pass (FusionNet flow -> warp -> fusion
          U-Net) a halo covering the receptive field (320 rows) makes the
          sharded run match the same-canvas single-device run to <= 1
          uint8 level on trained weights.
        * image borders: the canvas's explicit zero halo differs from
          per-layer conv zero padding (conv biases + BN shifts give the
          zero region nonzero 'vacuum' activations), so a receptive-field
          band at the top/bottom image edges deviates from the unpadded
          single-device path; rows >= 320 from the edges match it to
          <= 1 uint8.
        * interp: the KPN encoder reaches 1/32 scale and its align-corners
          upsampling is canvas-global, so row-sharded interp is
          approximate everywhere; the residual decays with the halo
          (test_dpxsp_sharded_converges_with_halo).

        Shard sections over ``data_axis`` (bit-exact, space=1) when exact
        reference parity matters; ``space_axis`` pays off for sections
        much larger than the halo.

        Returns {id: {'interp', 'fused', 'stitch', 'warped', 'flow'}}.
        """
        from sstem_tpu.parallel.spatial import spatial_apply

        _check_interior(damaged_ids, len(stack))
        # cfg.TEST.pad is applied by restore_stack's interpolate/restore
        # path; the sharded canvas path does not replicate it
        assert self.pad == 0, (
            "restore_stack_sharded does not support TEST.pad != 0; use "
            "restore_stack")
        n_dp = mesh.shape[data_axis]
        n_sp = mesh.shape[space_axis]
        stack = np.asarray(stack)
        z, h, w = stack.shape
        # spatial dims: pad W to 32; H handled by spatial_apply's canvas
        # (halo and shard rows kept 32-multiples for the models)
        assert halo % 32 == 0, "halo must be a multiple of 32"
        wp = -(-w // 32) * 32
        # pad H so each device's slab (plus halos) is a 32-multiple: the
        # canvas is H + 2*halo rows, split n_sp ways
        hp = -(-(h + 2 * halo) // (32 * n_sp)) * (32 * n_sp) - 2 * halo
        ids = list(damaged_ids)
        results = {}

        def batch_fn(x3):
            return spatial_apply(
                lambda xb: self._section_fn(
                    self.interp_vars, self.flow_vars, self.fusion_vars, xb),
                x3, mesh, halo, axis=space_axis, batch_axis=data_axis)

        fn = jax.jit(batch_fn)
        for s in range(0, len(ids), n_dp):
            grp = ids[s:s + n_dp]
            if len(grp) < n_dp:
                grp = (grp * n_dp)[:n_dp]  # pad the last group
            x3 = np.stack(
                [np.stack([stack[i - 1], stack[i + 1], stack[i]], -1)
                 for i in grp]).astype(np.float32) / 255.0
            x3 = np.pad(x3, [(0, 0), (0, hp - h), (0, wp - w), (0, 0)])
            out = np.asarray(fn(jnp.asarray(x3)), np.float32)[:, :h, :w]
            for j, i in enumerate(ids[s:s + n_dp]):
                interp = np.clip(out[j, ..., 0], 0, 1)
                fused = np.clip(out[j, ..., 1], 0, 1)
                warped = np.clip(out[j, ..., 2], 0, 1)
                flow = out[j, ..., 3:5]
                w8 = np.floor(warped * 255.0)
                m = w8 >= 2
                i8 = np.floor(interp * 255.0)
                stitch = np.where(m, w8, i8)
                results[i] = {
                    "interp": i8.astype(np.uint8),
                    "fused": np.floor(fused * 255).astype(np.uint8),
                    "warped": w8.astype(np.uint8),
                    "stitch": stitch.astype(np.uint8),
                    "flow": flow,
                }
        return results

    def _restore_ids(self, stack, damaged_ids):
        prev_ = jnp.stack([stack[i - 1] for i in damaged_ids])
        next_ = jnp.stack([stack[i + 1] for i in damaged_ids])
        interp = self.interpolate(prev_, next_)
        out = self.restore(
            jnp.stack([stack[i] for i in damaged_ids]),
            interp * 255.0,
        )
        results = {}
        for j, i in enumerate(damaged_ids):
            results[i] = {
                "interp": np.asarray(
                    jnp.floor(interp[j] * 255)
                ).astype(np.uint8),
                "fused": np.asarray(
                    jnp.floor(out["fused"][j] * 255)
                ).astype(np.uint8),
                "warped": np.asarray(
                    jnp.floor(out["warped"][j] * 255)
                ).astype(np.uint8),
                "stitch": np.asarray(
                    jnp.floor(out["stitch"][j] * 255)
                ).astype(np.uint8),
                "flow": np.asarray(out["flow"][j]),
            }
        return results


@dataclass
class SPPipeline:
    """SP quartet restoration: VFI + denoise + mask blend + fusion
    (sp_scripts_test/test_fusion.py:17-141)."""

    vfi_vars: dict
    denoise_vars: Optional[dict] = None
    fusion_vars: Optional[dict] = None
    kernel_size: int = 51
    packed: bool = True
    packed_conv: Optional[bool] = None  # packed Pallas conv serving for
        # UNetSP/FusionNetSP (models/serving.py); None = auto (TPU only)

    def __post_init__(self):
        if self.packed_conv is None:
            self.packed_conv = jax.default_backend() == "tpu"
        self.vfi = IFNet(kernel_size=self.kernel_size, n_frames=2,
                         packed=self.packed)
        self.denoise = UNetSP(1)
        self.fusion = FusionNetSP(1)

        def vfi_fn(variables, x):
            return self.vfi.apply(variables, x)

        def full_fn(dv, fv, vfi_pred, deg2, deg3, m2, m3):
            if self.packed_conv:
                from sstem_tpu.models.serving import (
                    fusionnet_sp_serve, unet_sp_serve)

                den2 = unet_sp_serve(dv, deg2)
                den3 = unet_sp_serve(dv, deg3)
                p1 = fusionnet_sp_serve(
                    fv, vfi_pred[..., 0:1] * (1 - m2), den2 * m2)
                p2 = fusionnet_sp_serve(
                    fv, vfi_pred[..., 1:2] * (1 - m3), den3 * m3)
                return p1, p2, den2, den3
            den2 = self.denoise.apply(dv, deg2, train=False)
            den3 = self.denoise.apply(dv, deg3, train=False)
            p1 = self.fusion.apply(
                fv, vfi_pred[..., 0:1] * (1 - m2), den2 * m2, train=False
            )
            p2 = self.fusion.apply(
                fv, vfi_pred[..., 1:2] * (1 - m3), den3 * m3, train=False
            )
            return p1, p2, den2, den3

        self._vfi_fn = jax.jit(vfi_fn)
        self._full_fn = jax.jit(full_fn)

    def interp(self, img1, img4):
        """test_interp parity: predict sections 2 & 3 from 1 & 4 (uint8 gray)."""
        x = _gray6(_to01(img1), _to01(img4))
        x, (h, w) = pad_to_multiple(x, 32)
        pred = self._vfi_fn(self.vfi_vars, x)[:, :h, :w, :]
        return jnp.clip(pred, 0.0, 1.0)

    def restore(self, img1, img4, deg2, deg3, mask2, mask3):
        """test_fusion parity. All args gray (N, H, W); masks in 0..255."""
        vfi_pred = self.interp(img1, img4)
        vfi_pad, (h, w) = pad_to_multiple(
            jnp.concatenate([vfi_pred[..., 0:1], vfi_pred[..., 1:2]], -1), 32
        )
        d2, _ = pad_to_multiple(_to01(deg2)[..., None], 32)
        d3, _ = pad_to_multiple(_to01(deg3)[..., None], 32)
        m2, _ = pad_to_multiple(_to01(mask2)[..., None], 32)
        m3, _ = pad_to_multiple(_to01(mask3)[..., None], 32)
        p1, p2, den2, den3 = self._full_fn(
            self.denoise_vars, self.fusion_vars, vfi_pad, d2, d3, m2, m3
        )
        return {
            "pred1": jnp.clip(p1[:, :h, :w, 0], 0, 1),
            "pred2": jnp.clip(p2[:, :h, :w, 0], 0, 1),
            "vfi1": vfi_pred[..., 0],
            "vfi2": vfi_pred[..., 1],
            "denoise1": jnp.clip(den2[:, :h, :w, 0], 0, 1),
            "denoise2": jnp.clip(den3[:, :h, :w, 0], 0, 1),
        }
