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
    unresolved = []
    for side, scores, label in (("torch", t_scores, "reference (torch)"),
                                ("jax", j_scores, "this framework (jax)")):
        if len(scores) < 2:
            continue
        rows = _side_rows(scores, side, jax_psnr, torch_psnr)
        iters = scores[0][1].get("iters", "?")
        lines += [
            f"### {label} seed controls ({len(scores)} trainings, "
            f"{iters} iters/stage, seeds offset 0..{len(scores) - 1})",
            "",
            "| output | " + " | ".join(
                f"{side}+{i}" for i in range(len(scores)))
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
            if not r["inside"]:
                unresolved.append((key, side, r))
        lines.append("")
    lines.append(
        "`inside spread?` compares |jax-f32 − torch| against "
        "max(2·std, range) of that side's controls.")

    if unresolved:
        worst = {}
        for key, side, r in unresolved:
            worst.setdefault(key, []).append(side)

        def _favor(key):
            d = jax_psnr[key] - torch_psnr[key]
            return (f"{key} ({d:+.2f} dB, "
                    + ("in this framework's favor"
                       if d > 0 else "in the reference's favor") + ")")

        adverse = [k for k in worst if jax_psnr[k] - torch_psnr[k] < 0]
        lines += [
            "",
            "**Unresolved deltas** (outside the measured spread of "
            + ", ".join(sorted({s for _, s, _ in unresolved}))
            + " controls): " + "; ".join(_favor(k) for k in worst)
            + ". These are NOT claimed as noise: at this reduced horizon "
            "the affected stage(s) are far from converged (both sides "
            "score below their own interp stage) and the spread estimates "
            "are small-N. Until a converged-horizon H2H is affordable on "
            "this rig (a torch control costs CPU-hours per seed on one "
            "host core), the <= 0.1 dB parity gate rests on "
            + ("the favorable direction of every out-of-spread delta"
               if not adverse else
               "NO unconditional direction claim — "
               + ", ".join(adverse) + " is out of spread in the "
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
