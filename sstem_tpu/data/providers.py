"""Sample providers: infinite training streams + map-style validation sets.

Re-designs the reference's torch-DataLoader plumbing as a host-threaded
prefetch pipeline feeding device arrays (NHWC float32):

  * ``InterpTrainDataset`` — triplet txt reader, random crop, joint dihedral
    augs, optional frame swap / jitter / gaussian noise / elastic transform
    (sff_scripts_interp/data/data_provider.py:93-157). Input (H, W, 6) =
    [i1 x3ch ++ i3 x3ch] / 255; label (H, W, 1) = middle section / 255.
  * ``UnfoldingTrainDataset`` — clean section + precomputed interp image,
    on-the-fly fold degradation of a 400^2 crop center-cropped to 256^2;
    label = GT unfolding flow2 (sff_scripts_unfolding/data/data_provider.py:
    105-175). ``label='clean'`` gives the fusion variant (label = clean crop,
    line_width 5..20 — sff_scripts_fusion/data/data_provider.py:163-185).
    The reference's 'swap' aug at this layer indexes a nonexistent frame
    (im_lb[2], an out-of-range bug); configs ship swap=False and it is not
    re-created here.
  * Valid datasets (map-style): interp triplets; unfolding with GT flow2 read
    from ``<name>_flow.hdf`` HDF5 key 'flow2'
    (sff_scripts_unfolding/data/provider_valid.py:27-54); fusion with clean GT.
  * ``SPDataset`` — 12-column txt rows (sp_scripts_train/gen_data_txt.py),
    random crop, 8-way dihedral, ColorJitter on the degraded frames only,
    reversed masks computed in-python (sp_scripts_train/dataset.py:21-253).
    Unlike the reference it never touches the device in ``__getitem__`` (the
    reference's .cuda()-in-dataset is a multiprocessing hazard, SURVEY §5.2).
  * ``Provider`` — infinite batched stream with background prefetch threads
    and async device transfer; ``.next()`` parity with the reference Provider.
"""

import os
import queue
import threading
from dataclasses import dataclass, field

import jax
import numpy as np

from sstem_tpu.data import augment
from sstem_tpu.data.sim_sff import degrade_sff


def _read_gray(path):
    from PIL import Image

    return np.asarray(Image.open(path))


@dataclass
class AugConfig:
    random_fliplr: bool = True
    random_flipud: bool = True
    random_flipz: bool = True   # transpose
    random_rotation: bool = True
    swap: bool = False
    color_jitter: bool = False
    brightness: float = 0.2
    contrast: float = 0.2
    saturation: float = 0.2
    gauss_noise: bool = False
    gauss_mean: float = 0.0
    gauss_sigma: float = 0.001
    elastic_trans: bool = False
    alpha_range: float = 100.0
    sigma: float = 10.0
    shave: int = 20


class _ImageCache:
    """Loads listed images once; CREMI-scale data fits host RAM easily."""

    def __init__(self, folder):
        self.folder = folder
        self._cache = {}

    def __call__(self, name):
        if name not in self._cache:
            self._cache[name] = _read_gray(os.path.join(self.folder, name))
        return self._cache[name]


def _load_pool(cache, name_rows, max_bytes):
    """Stack rows of image names into (N, F, H, W) uint8, or None when the
    shapes are non-uniform or the pool would exceed ``max_bytes``."""
    shapes = {cache(n).shape for row in name_rows for n in row}
    if len(shapes) != 1:
        return None
    (h, w), = shapes
    f = len(name_rows[0])
    if len(name_rows) * f * h * w > max_bytes:
        return None
    return np.stack([np.stack([cache(n) for n in row])
                     for row in name_rows])


class InterpTrainDataset:
    """SFF interpolation triplets -> ((H,W,6) input, (H,W,1) label)."""

    def __init__(self, folder, train_txt="train_data.txt",
                 patch_size=(256, 256), aug: AugConfig = None):
        self.cache = _ImageCache(folder)
        with open(os.path.join(folder, train_txt)) as f:
            self.rows = [r.strip().split(" ") for r in f if r.strip()]
        self.patch_size = tuple(patch_size)
        self.aug = aug or AugConfig()

    def load_pool(self, max_bytes=512 << 20):
        """All triplets as one (N, 3, H, W) uint8 array for HBM-resident
        on-device sampling (train.device_datagen.make_pool_interp_step), or
        None when images are non-uniform / the pool exceeds ``max_bytes``."""
        return _load_pool(self.cache, [r[:3] for r in self.rows], max_bytes)

    def sample(self, rng):
        a = self.aug
        row = self.rows[rng.integers(0, len(self.rows))]
        imgs = [self.cache(n) for n in row[:3]]
        h, w = imgs[0].shape
        ch, cw = self.patch_size
        i = rng.integers(0, h - ch + 1)
        j = rng.integers(0, w - cw + 1)
        stack = np.stack([im[i:i + ch, j:j + cw] for im in imgs])

        stack = augment.dihedral(stack, rng, a.random_fliplr, a.random_flipud,
                                 a.random_flipz, a.random_rotation)
        if a.swap:
            stack = augment.swap_frames(stack, rng)
        if a.color_jitter:
            stack = np.stack([
                augment.color_jitter(s, rng, a.brightness, a.contrast,
                                     a.saturation) for s in stack
            ])

        im = np.concatenate([
            np.repeat(stack[0:1], 3, 0), np.repeat(stack[2:3], 3, 0)
        ]).astype(np.float32) / 255.0
        lb = stack[1:2].astype(np.float32) / 255.0
        if a.gauss_noise:
            im = augment.gauss_noise(im, rng, a.gauss_mean, a.gauss_sigma)
        if a.elastic_trans:
            im, lb = augment.elastic_transform(im, lb, rng, a.alpha_range,
                                               a.sigma, a.shave)
        # CHW -> HWC
        return np.transpose(im, (1, 2, 0)), np.transpose(lb, (1, 2, 0))


class UnfoldingTrainDataset:
    """Clean+interp pairs degraded on the fly.

    label='flow'  -> GT unfolding flow2 (H, W, 2)        [unfolding trainer]
    label='clean' -> clean center crop (H, W, 1) / 255   [fusion trainer]
    """

    def __init__(self, folder, train_txt, interp_txt, crop_size=400,
                 det_size=256, label="flow", line_width_range=(5, 50),
                 gt_line=False, aug: AugConfig = None):
        self.cache = _ImageCache(folder)
        with open(os.path.join(folder, train_txt)) as f:
            self.rows = [r.strip().split(" ") for r in f if r.strip()]
        with open(os.path.join(folder, interp_txt)) as f:
            self.interp_rows = [r.strip() for r in f if r.strip()]
        assert len(self.rows) == len(self.interp_rows)
        self.crop_size = crop_size
        self.det_size = det_size
        self.offset = (crop_size - det_size) // 2
        self.label = label
        self.line_width_range = line_width_range
        self.gt_line = gt_line
        self.aug = aug or AugConfig()

    def sample(self, rng):
        a = self.aug
        kk = rng.integers(0, len(self.rows))
        # middle column of the triplet row is the section this interp predicts
        clean = self.cache(self.rows[kk][1])
        interp = self.cache(self.interp_rows[kk])

        c = self.crop_size
        h, w = clean.shape
        i = rng.integers(0, h - c + 1)
        j = rng.integers(0, w - c + 1)
        stack = np.stack([clean[i:i + c, j:j + c], interp[i:i + c, j:j + c]])
        stack = augment.dihedral(stack, rng, a.random_fliplr, a.random_flipud,
                                 a.random_flipz, a.random_rotation)

        img2 = stack[0]
        if a.color_jitter:
            img2 = augment.color_jitter(img2, rng, a.brightness, a.contrast,
                                        a.saturation)
        off = self.offset
        clean_c = img2[off:-off, off:-off].copy()

        d = degrade_sff(img2, rng, det_size=self.det_size,
                        line_width_range=self.line_width_range)
        degraded = d["degraded"]

        if self.gt_line:
            clean_c = clean_c * (degraded != 0)

        interp_c = stack[1][off:-off, off:-off]
        im = np.concatenate([
            np.repeat(degraded[None], 3, 0), np.repeat(interp_c[None], 3, 0)
        ]).astype(np.float32) / 255.0

        if self.label == "flow":
            lb = d["flow2"]  # (det, det, 2)
        else:
            lb = (clean_c.astype(np.float32) / 255.0)[..., None]
        return np.transpose(im, (1, 2, 0)), lb


class RawCropPairDataset:
    """(clean crop, interp crop) uint8 pairs for the on-device-datagen
    trainer (sstem_tpu.train.device_datagen): the host only crops and
    augments; degradation/labels happen inside the jitted train step."""

    def __init__(self, folder, train_txt, interp_txt, crop_size=400,
                 aug: AugConfig = None):
        self.cache = _ImageCache(folder)
        with open(os.path.join(folder, train_txt)) as f:
            self.rows = [r.strip().split(" ") for r in f if r.strip()]
        with open(os.path.join(folder, interp_txt)) as f:
            self.interp_rows = [r.strip() for r in f if r.strip()]
        assert len(self.rows) == len(self.interp_rows)
        self.crop_size = crop_size
        self.aug = aug or AugConfig()

    def load_pool(self, max_bytes=512 << 20):
        """(N, 2, H, W) uint8 clean+interp pool for on-device sampling
        (train.device_datagen.make_pool_step), or None when images are
        non-uniform / the pool exceeds ``max_bytes``."""
        rows = [[r[1], i] for r, i in zip(self.rows, self.interp_rows)]
        return _load_pool(self.cache, rows, max_bytes)

    def sample(self, rng):
        a = self.aug
        kk = rng.integers(0, len(self.rows))
        clean = self.cache(self.rows[kk][1])
        interp = self.cache(self.interp_rows[kk])
        c = self.crop_size
        h, w = clean.shape
        i = rng.integers(0, h - c + 1)
        j = rng.integers(0, w - c + 1)
        stack = np.stack([clean[i:i + c, j:j + c], interp[i:i + c, j:j + c]])
        stack = augment.dihedral(stack, rng, a.random_fliplr, a.random_flipud,
                                 a.random_flipz, a.random_rotation)
        # uint8 on the wire: the devgen loss casts on device, and the
        # host->TPU tunnel transfer is the step bottleneck at batch >= 16
        # (4x smaller than float32; measured round 5)
        return np.ascontiguousarray(stack[0]), np.ascontiguousarray(stack[1])


class FusionTrainDataset(UnfoldingTrainDataset):
    """Fusion trainer dataset: clean-crop labels, line_width 5..20."""

    def __init__(self, folder, train_txt, interp_txt, **kw):
        kw.setdefault("label", "clean")
        kw.setdefault("line_width_range", (5, 20))
        super().__init__(folder, train_txt, interp_txt, **kw)


class InterpValidDataset:
    """Map-style triplets -> ((H,W,6), (H,W,1))."""

    def __init__(self, folder, valid_txt="valid_data.txt"):
        self.cache = _ImageCache(folder)
        with open(os.path.join(folder, valid_txt)) as f:
            self.rows = [r.strip().split(" ") for r in f if r.strip()]

    def __len__(self):
        return len(self.rows)

    def __getitem__(self, idx):
        imgs = [self.cache(n).astype(np.float32) / 255.0
                for n in self.rows[idx][:3]]
        im = np.stack([imgs[0]] * 3 + [imgs[2]] * 3, axis=-1)
        lb = imgs[1][..., None]
        return im, lb


class UnfoldingValidDataset:
    """Degraded + interp images with GT flow2 from HDF5 sidecars.

    Row format: '<degraded.png> <interp.png> <name>_flow.hdf' — the HDF file
    holds dataset 'flow2' (provider_valid.py:27-54)."""

    def __init__(self, folder, valid_txt):
        self.folder = folder
        with open(os.path.join(folder, valid_txt)) as f:
            self.rows = [r.strip().split(" ") for r in f if r.strip()]

    def __len__(self):
        return len(self.rows)

    def __getitem__(self, idx):
        import h5py

        deg = _read_gray(os.path.join(self.folder, self.rows[idx][0]))
        interp = _read_gray(os.path.join(self.folder, self.rows[idx][1]))
        with h5py.File(os.path.join(self.folder, self.rows[idx][2]), "r") as f:
            flow2 = np.asarray(f["flow2"])
        im = np.stack([deg.astype(np.float32) / 255.0] * 3
                      + [interp.astype(np.float32) / 255.0] * 3, axis=-1)
        return im, flow2.astype(np.float32)


class FusionValidDataset:
    """Degraded + interp + clean GT rows."""

    def __init__(self, folder, valid_txt):
        self.folder = folder
        with open(os.path.join(folder, valid_txt)) as f:
            self.rows = [r.strip().split(" ") for r in f if r.strip()]

    def __len__(self):
        return len(self.rows)

    def __getitem__(self, idx):
        deg = _read_gray(os.path.join(self.folder, self.rows[idx][0]))
        interp = _read_gray(os.path.join(self.folder, self.rows[idx][1]))
        clean = _read_gray(os.path.join(self.folder, self.rows[idx][2]))
        im = np.stack([deg.astype(np.float32) / 255.0] * 3
                      + [interp.astype(np.float32) / 255.0] * 3, axis=-1)
        return im, (clean.astype(np.float32) / 255.0)[..., None]


_SP_KEYS = [
    "img_1", "img_2", "img_2_degra", "img_3", "img_3_degra", "img_4",
    "img_2_degraB1_mask_gradall", "img_3_degraB1_mask_gradall",
    "img_2_degraB1_mask_gradall_r", "img_3_degraB1_mask_gradall_r",
    "img_2_degraB1_GenGradMask", "img_3_degraB1_GenGradMask",
    "img_2_degraB1_GenGradMask_r", "img_3_degraB1_GenGradMask_r",
    "img_2_degraB1_vfi", "img_3_degraB1_vfi",
]


def write_sp_txt(folder, num, path="sp_train_data.txt"):
    """12-column SP row writer (gen_data_txt.py dialect)."""
    with open(os.path.join(folder, path), "w") as f:
        for i in range(1, num + 1):
            stem = str(i).zfill(4)
            cols = [f"{stem}_1.png", f"{stem}_2.png", f"{stem}_2_degra.png",
                    f"{stem}_3.png", f"{stem}_3_degra.png", f"{stem}_4.png",
                    f"{stem}_2_degra_maska.png", f"{stem}_3_degra_maska.png",
                    f"{stem}_2_degra_maskb.png", f"{stem}_3_degra_maskb.png",
                    f"{stem}_2_interp.png", f"{stem}_3_interp.png"]
            f.write(" ".join(cols) + " \n")


class SPDataset:
    """SP quartet dataset -> dict of (H, W, 1) float arrays in [0,1].

    Column order per row: clean 1/2, degraded 2, clean 3, degraded 3, clean 4,
    grad masks (a) for 2/3, generated masks (b) for 2/3 [, vfi 2/3]."""

    def __init__(self, data_folder, data_txt, patch_size=256, if_rotate=True,
                 if_bdadjust=True, use_vfi=False):
        self.folder = data_folder
        with open(data_txt) as f:
            self.rows = [r.strip().split(" ") for r in f if r.strip()]
        self.rows = [[c for c in row if c] for row in self.rows]
        self.patch_size = patch_size
        self.if_rotate = if_rotate
        self.if_bdadjust = if_bdadjust
        self.use_vfi = use_vfi
        self.cache = _ImageCache(data_folder)

    def __len__(self):
        return len(self.rows)

    def _load_row(self, idx):
        row = self.rows[idx]
        imgs = [self.cache(row[i]) for i in range(6)]
        maska = [self.cache(row[6]), self.cache(row[7])]
        maskb = [self.cache(row[8]), self.cache(row[9])]
        out = imgs + maska + [255 - m for m in maska] + maskb + [
            255 - m for m in maskb
        ]
        if self.use_vfi:
            out += [self.cache(row[10]), self.cache(row[11])]
        return out

    def get(self, idx, rng):
        imgs = self._load_row(idx)
        h, w = imgs[0].shape[:2]
        p = self.patch_size
        i = rng.integers(0, h - p + 1)
        j = rng.integers(0, w - p + 1)
        imgs = [im[i:i + p, j:j + p] for im in imgs]

        if self.if_rotate:
            case = rng.integers(0, 8)
            # 8-way dihedral: rot90 x {0..3} (+ fliplr) — RotationFlip parity
            rots = [0, 0, 1, 1, 2, 2, 3, 3]
            flips = [0, 1, 0, 1, 0, 1, 0, 1]
            imgs = [np.rot90(im, rots[case]) for im in imgs]
            if flips[case]:
                imgs = [np.fliplr(im) for im in imgs]

        out = {}
        for k, im in zip(_SP_KEYS, imgs):
            if self.if_bdadjust and k in ("img_2_degra", "img_3_degra") and \
                    rng.uniform() > 0.7:
                im = augment.color_jitter(np.ascontiguousarray(im), rng,
                                          0.2, 0.2, 0.2)
            out[k] = (np.ascontiguousarray(im).astype(np.float32) / 255.0)[..., None]
        return out

    def sample(self, rng):
        return self.get(rng.integers(0, len(self.rows)), rng)

    @staticmethod
    def dilate_mask(mask, thickness):
        """cv2 dilation (reference DilateMask, dataset.py:238-243 — unused
        by the reference trainers; provided for surface parity)."""
        import cv2

        k = np.ones((thickness, thickness), np.uint8)
        return cv2.dilate(np.asarray(mask), k, iterations=1)

    @staticmethod
    def erode_mask(mask, thickness):
        """cv2 erosion (reference ErodeMask, dataset.py:245-250)."""
        import cv2

        k = np.ones((thickness, thickness), np.uint8)
        return cv2.erode(np.asarray(mask), k, iterations=1)


class Provider:
    """Infinite batched stream with background prefetch -> device arrays.

    API parity with the reference Provider (data_provider.py:289-336):
    ``Provider(dataset, batch_size).next()`` returns the next batch, already
    transferred to the default device. Batches are pytrees (tuples or dicts)
    stacked on a new leading axis.
    """

    def __init__(self, dataset, batch_size, seed=555, num_threads=2,
                 prefetch=4, device_put=True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.device_put = device_put
        self._q = queue.Queue(maxsize=prefetch)
        self._stop = threading.Event()
        self._threads = []
        for t in range(max(1, num_threads)):
            rng = np.random.default_rng(None if seed in (-1, None) else seed + t)
            th = threading.Thread(target=self._worker, args=(rng,), daemon=True)
            th.start()
            self._threads.append(th)

    def _worker(self, rng):
        while not self._stop.is_set():
            samples = [self.dataset.sample(rng) for _ in range(self.batch_size)]
            batch = jax.tree_util.tree_map(
                lambda *xs: np.stack(xs), *samples
            )
            # retry the SAME batch on backpressure — rebuilding it burned
            # real host CPU with the slow simulators (VERDICT r1 weak #7)
            while not self._stop.is_set():
                try:
                    self._q.put(batch, timeout=1.0)
                    break
                except queue.Full:
                    continue

    def next(self):
        batch = self._q.get()
        if self.device_put:
            batch = jax.device_put(batch)
        return batch

    def close(self):
        self._stop.set()
