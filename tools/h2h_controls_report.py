"""Aggregate H2H seed-perturbation controls into H2H.md (VERDICT r3 item 5).

Reads ``control_scores.json`` from torch-side control roots (``--roots``)
and jax-side control roots (``--jax-roots``), and rewrites the
"Run-to-run noise calibration" section of H2H.md with mean ± spread
columns per side, so each cross-implementation delta can be judged against
real spread estimates instead of a single control pair. Deltas outside
BOTH spreads are reported as UNRESOLVED (not waved through as noise) —
the round-3 advisor's finding.

A torch control costs CPU-hours per seed on this rig (one host core); a
jax control runs at TPU rate in minutes (``head_to_head.py --stage jax
--seed-offset N`` + ``--stage score_jax``). When only the committed r3
torch pair (offsets 0, 1) exists, pass those two roots and lean on the
jax-side N for the spread shape.

    python tools/h2h_controls_report.py \
        --roots /tmp/sstem_h2h /tmp/sstem_h2h_b \
        --jax-roots /tmp/sstem_h2h /tmp/sstem_h2h_j2 /tmp/sstem_h2h_j3 \
        --f10k /tmp/sstem_h2h_f10k --out H2H.md
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KEYS = ("interp", "fused", "stitch")


def load_scores(root, expect_side=None):
    """Load a control root's scores — side-specific files first
    (control_scores_{torch,jax}.json; ADVICE r4), legacy name as fallback
    so pre-round-5 artifacts keep working."""
    names = ([f"control_scores_{expect_side}.json"] if expect_side
             else ["control_scores_torch.json", "control_scores_jax.json"])
    names.append("control_scores.json")
    for name in names:
        path = os.path.join(root, name)
        if not os.path.exists(path):
            continue
        s = json.load(open(path))
        if expect_side and s.get("side", expect_side) != expect_side:
            continue
        return s
    return None


def _load_roots(roots, side):
    out = []
    for r in roots or []:
        s = load_scores(r, expect_side=side)
        if s is None:
            print(f"warning: {r} has no {side}-side control_scores.json; "
                  "skipped", file=sys.stderr)
            continue
        out.append((r, s))
    return out


def _side_rows(scores, side, jax_psnr, torch_psnr):
    """Per-key stats for one side's controls + the cross-impl delta
    against that side's mean."""
    rows = {}
    for key in KEYS:
        vals = np.array([s[key]["psnr"] for _, s in scores])
        mean = float(vals.mean())
        std = float(vals.std(ddof=1)) if len(vals) > 1 else float("nan")
        spread = float(vals.max() - vals.min())
        # the cross-impl delta: jax-f32 minus torch. Judged against the
        # side's own spread (for torch controls: jax vs torch mean; for
        # jax controls: torch vs jax mean — same magnitude, sign flipped).
        delta = jax_psnr.get(key, float("nan")) - torch_psnr.get(
            key, float("nan"))
        inside = abs(delta) <= max(2 * std if std == std else 0.0, spread)
        rows[key] = dict(vals=vals, mean=mean, std=std, spread=spread,
                         delta=delta, inside=inside)
    return rows


def _offset_label(root, index):
    """Column label for a control root: its seed offset, inferred from a
    trailing digit in the directory name (…_j2 -> +2, …_t0 -> +0); the
    base root (no trailing digit) is offset 0; fallback: the list index."""
    base = os.path.basename(os.path.normpath(root))
    tail = base.rsplit("_", 1)[-1]
    digits = "".join(c for c in tail if c.isdigit())
    if digits:
        return int(digits)
    return 0 if index == 0 else index


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--roots", nargs="+", default=[],
                    help="torch-side control roots, base (offset 0) first")
    ap.add_argument("--jax-roots", nargs="+", default=[],
                    help="jax-side control roots, base (offset 0) first")
    ap.add_argument("--jax-json", default=None,
                    help="json with jax-f32 psnr per stage (default: parse "
                         "the existing H2H.md table)")
    ap.add_argument("--f10k", default=None,
                    help="root of a longer-fusion-horizon control "
                         "(optional, either side)")
    ap.add_argument("--out", default="H2H.md")
    args = ap.parse_args()

    t_scores = _load_roots(args.roots, "torch")
    j_scores = _load_roots(args.jax_roots, "jax")
    if len(t_scores) + len(j_scores) < 3:
        print("need >= 3 scored control roots overall", file=sys.stderr)
        return 1

    # base-run cross-impl scores: parse the main H2H.md table
    jax_psnr, torch_psnr = {}, {}
    if args.jax_json:
        jax_psnr = json.load(open(args.jax_json))
    if not os.path.exists(args.out) and not args.jax_json:
        print(f"{args.out} missing and no --jax-json", file=sys.stderr)
        return 1
    if os.path.exists(args.out):
        for line in open(args.out):
            parts = [p.strip() for p in line.split("|")]
            if len(parts) > 5 and parts[1] in KEYS:
                if parts[1] not in torch_psnr:
                    torch_psnr[parts[1]] = float(parts[2])
                if parts[1] not in jax_psnr:
                    jax_psnr[parts[1]] = float(parts[4])

    lines = ["## Run-to-run noise calibration (controls: "
             f"torch N={len(t_scores)}, jax N={len(j_scores)})", ""]
    side_rows = {}
    for side, scores, label in (("torch", t_scores, "reference (torch)"),
                                ("jax", j_scores, "this framework (jax)")):
        if len(scores) < 2:
            continue
        rows = _side_rows(scores, side, jax_psnr, torch_psnr)
        side_rows[side] = rows
        iters = scores[0][1].get("iters", "?")
        offs = [_offset_label(r, i) for i, (r, _) in enumerate(scores)]
        lines += [
            f"### {label} seed controls ({len(scores)} trainings, "
            f"{iters} iters/stage, seeds offset "
            + ", ".join(str(o) for o in offs) + ")",
            "",
            "| output | " + " | ".join(
                f"{side}+{o}" for o in offs)
            + " | mean ± std | jax−torch delta | inside spread? |",
            "|---|" + "---|" * (len(scores) + 3),
        ]
        for key in KEYS:
            r = rows[key]
            std_s = f"{r['std']:.3f}" if r["std"] == r["std"] else "n/a"
            lines.append(
                "| " + key + " | "
                + " | ".join(f"{v:.3f}" for v in r["vals"])
                + f" | {r['mean']:.3f} ± {std_s} | {r['delta']:+.3f} | "
                + ("yes" if r["inside"] else "**no**") + " |")
        lines.append("")
    lines.append(
        "`inside spread?` compares the PAIRED offset-0 delta |jax-f32 − "
        "torch| against max(2·std, range) of that side's controls — a "
        "seed-pair statistic that inherits whichever single runs the "
        "offset-0 seeds happened to produce.")

    # Mean-vs-mean verdicts: the fairer cross-side statistic once both
    # sides have N >= 2 controls (the paired offset-0 comparison can be
    # dominated by one side's lucky/unlucky seed; r5 found exactly that
    # for interp, where torch+0 was the best of its three controls).
    if len(side_rows) == 2:
        verdicts, unresolved = [], []
        for key in KEYS:
            tr, jr = side_rows["torch"][key], side_rows["jax"][key]
            d = jr["mean"] - tr["mean"]
            t_env = max(2 * tr["std"] if tr["std"] == tr["std"] else 0.0,
                        tr["spread"])
            j_env = max(2 * jr["std"] if jr["std"] == jr["std"] else 0.0,
                        jr["spread"])
            if abs(d) <= min(t_env, j_env):
                where = "inside both spreads — resolved as seed noise"
            elif abs(d) <= max(t_env, j_env):
                where = ("inside the "
                         + ("torch" if abs(d) <= t_env else "jax")
                         + " spread — consistent with seed noise")
            else:
                where = "OUTSIDE both spreads — systematic"
                unresolved.append(key)
            verdicts.append(f"{key} jax {jr['mean']:.3f} vs torch "
                            f"{tr['mean']:.3f} = **{d:+.3f} dB** ({where})")
        lines += [
            "",
            "**Control-mean comparison** (jax mean − torch mean, judged "
            "against both sides' max(2·std, range) envelopes): "
            + "; ".join(verdicts) + ".",
        ]
        if unresolved:
            def _favor(key):
                d = (side_rows["jax"][key]["mean"]
                     - side_rows["torch"][key]["mean"])
                return (f"{key} ({d:+.2f} dB, "
                        + ("in this framework's favor"
                           if d > 0 else "in the reference's favor") + ")")

            adverse = [k for k in unresolved
                       if side_rows["jax"][k]["mean"]
                       < side_rows["torch"][k]["mean"]]
            lines += [
                "",
                "**Systematic deltas** (control means outside both sides' "
                "spreads): " + "; ".join(_favor(k) for k in unresolved)
                + ". These are NOT claimed as noise: at this reduced "
                "horizon the affected stage(s) are far from converged "
                "(both sides score below their own interp stage). Until a "
                "converged-horizon H2H is affordable on this rig (a torch "
                "control costs CPU-hours per seed on one host core), the "
                "<= 0.1 dB parity gate rests on "
                + ("the favorable direction of every systematic delta "
                   "(see the fusion-horizon section: the fused delta "
                   "persists at 4x horizon, in this framework's favor)"
                   if not adverse else
                   "NO unconditional direction claim — "
                   + ", ".join(adverse) + " is systematic in the "
                   "reference's favor and needs a root cause")
                + ", plus the step-level trajectory parity tests "
                "(tests/test_training_parity.py).",
            ]

    if args.f10k:
        s10 = load_scores(args.f10k)
        if s10:
            side = s10.get("side", "torch")
            base = (t_scores if side == "torch" else j_scores)
            lines += [
                "",
                f"### Fusion-horizon check ({side}, fusion stage "
                f"{s10.get('iters_fusion', '?')} iters)",
                "",
                f"| output | {side}@2500-fusion (offset 0) | {side}@"
                f"{s10.get('iters_fusion', '?')}-fusion |",
                "|---|---|---|",
            ]
            for key in KEYS:
                lines.append(f"| {key} | {base[0][1][key]['psnr']:.3f} | "
                             f"{s10[key]['psnr']:.3f} |")

    text = open(args.out).read()
    marker = "## Run-to-run noise calibration"
    if marker in text:
        text = text[: text.index(marker)]
    text = text.rstrip() + "\n\n" + "\n".join(lines) + "\n"
    with open(args.out, "w") as f:
        f.write(text)
    print("\n".join(lines))
    return 0


if __name__ == "__main__":
    sys.exit(main())
