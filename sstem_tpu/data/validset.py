"""Validation-set builder for the unfolding/fusion stages.

The reference consumes precomputed valid sets: degraded sections + interp
images + ground-truth unfolding flow stored in ``<name>_flow.hdf`` HDF5
sidecars under key 'flow2' (sff_scripts_unfolding/provider_valid.py:27-54),
but ships no builder for them. This generates such a set from clean
sections + interp images with the same degradation model as training.
"""

import os

import numpy as np

from sstem_tpu.data.sim_sff import degrade_sff


def make_unfolding_validset(folder, out_dir, rows, interp_names=None,
                            crop=400, det=256, seed=0,
                            line_width_range=(5, 50)):
    """Build a valid set; returns the list of txt rows written.

    rows: triplet rows (only the middle/clean column is used).
    interp_names: per-row interp image names (defaults to the clean section
    itself — a stand-in when no interp stage output exists).
    Writes per item: NNNN.png (degraded), NNNN_interp.png, NNNN_gt.png,
    NNNN_flow.hdf ('flow2'), plus valid txt files for both the unfolding
    dialect (deg interp flow.hdf) and the fusion dialect (deg interp gt).
    """
    import h5py
    from PIL import Image

    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    unfold_rows, fusion_rows = [], []
    for i, row in enumerate(rows):
        clean = np.asarray(Image.open(os.path.join(folder, row[1])))
        if interp_names is not None:
            interp = np.asarray(
                Image.open(os.path.join(folder, interp_names[i]))
            )
        else:
            interp = clean
        h, w = clean.shape
        ci = (h - crop) // 2
        cj = (w - crop) // 2
        crop_img = clean[ci:ci + crop, cj:cj + crop]
        interp_c = interp[ci:ci + crop, cj:cj + crop]
        off = (crop - det) // 2

        d = degrade_sff(crop_img, rng, det_size=det,
                        line_width_range=line_width_range)
        stem = "%04d" % i
        Image.fromarray(d["degraded"]).save(
            os.path.join(out_dir, stem + ".png"))
        Image.fromarray(interp_c[off:-off, off:-off] if off else interp_c
                        ).save(os.path.join(out_dir, stem + "_interp.png"))
        Image.fromarray(crop_img[off:-off, off:-off] if off else crop_img
                        ).save(os.path.join(out_dir, stem + "_gt.png"))
        with h5py.File(os.path.join(out_dir, stem + "_flow.hdf"), "w") as f:
            f.create_dataset("flow2", data=d["flow2"])
        unfold_rows.append(
            f"{stem}.png {stem}_interp.png {stem}_flow.hdf")
        fusion_rows.append(f"{stem}.png {stem}_interp.png {stem}_gt.png")

    with open(os.path.join(out_dir, "unfolding_valid.txt"), "w") as f:
        f.write("\n".join(unfold_rows) + "\n")
    with open(os.path.join(out_dir, "fusion_valid.txt"), "w") as f:
        f.write("\n".join(fusion_rows) + "\n")
    return unfold_rows
