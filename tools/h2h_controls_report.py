"""Aggregate H2H seed-perturbation controls into H2H.md (VERDICT r3 item 5).

Reads ``control_scores.json`` from each control root (offset-0 base plus
N>=2 perturbed seeds) and the base run's jax scores, and rewrites the
"Run-to-run noise calibration" section of H2H.md with a mean +/- spread
column so each cross-implementation delta can be judged against a real
spread estimate instead of a single control pair.

    python tools/h2h_controls_report.py \
        --roots /tmp/sstem_h2h /tmp/sstem_h2h_b /tmp/sstem_h2h_c2 \
                /tmp/sstem_h2h_c3 \
        --f10k /tmp/sstem_h2h_f10k --out H2H.md
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KEYS = ("interp", "fused", "stitch")


def load_scores(root):
    path = os.path.join(root, "control_scores.json")
    if not os.path.exists(path):
        return None
    return json.load(open(path))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--roots", nargs="+", required=True,
                    help="control roots, base (offset 0) first")
    ap.add_argument("--jax-json", default=None,
                    help="json with jax-f32 psnr per stage (default: parse "
                         "the existing H2H.md table)")
    ap.add_argument("--f10k", default=None,
                    help="root of the 10k-fusion-horizon run (optional)")
    ap.add_argument("--out", default="H2H.md")
    args = ap.parse_args()

    scores = []
    for r in args.roots:
        s = load_scores(r)
        if s is None:
            print(f"warning: {r} has no control_scores.json; skipped",
                  file=sys.stderr)
            continue
        scores.append((r, s))
    if len(scores) < 3:
        print("need >= 3 scored roots for a spread estimate", file=sys.stderr)
        return 1

    jax_psnr = {}
    if args.jax_json:
        jax_psnr = json.load(open(args.jax_json))
    else:
        # parse the jax-f32 column out of the existing H2H.md MAIN table
        # (first match per key — later control tables also start with the
        # stage name)
        if not os.path.exists(args.out):
            print(f"{args.out} missing and no --jax-json", file=sys.stderr)
            return 1
        for line in open(args.out):
            parts = [p.strip() for p in line.split("|")]
            if (len(parts) > 5 and parts[1] in KEYS
                    and parts[1] not in jax_psnr):
                jax_psnr[parts[1]] = float(parts[4])

    lines = [
        "## Run-to-run noise calibration (control, N=%d)" % len(scores),
        "",
        "%d reference-side trainings differing only in a seed offset"
        % len(scores),
        "(`--seed-offset`; same image pool, same eval stack) calibrate how",
        "much %s-iter outcomes vary under minimal perturbation:"
        % scores[0][1].get("iters", "?"),
        "",
        "| output | " + " | ".join(
            f"torch+{i}" for i in range(len(scores)))
        + " | torch mean ± std | jax-f32 − mean | inside spread? |",
        "|---|" + "---|" * (len(scores) + 3),
    ]
    verdicts = {}
    for key in KEYS:
        vals = np.array([s[key]["psnr"] for _, s in scores])
        mean, std = float(vals.mean()), float(vals.std(ddof=1))
        spread = float(vals.max() - vals.min())
        delta = jax_psnr.get(key, float("nan")) - mean
        inside = abs(delta) <= max(2 * std, spread)
        verdicts[key] = (delta, std, spread, inside)
        lines.append(
            "| " + key + " | "
            + " | ".join(f"{v:.3f}" for v in vals)
            + f" | {mean:.3f} ± {std:.3f} | {delta:+.3f} | "
            + ("yes" if inside else "**no**") + " |")
    lines.append("")
    lines.append(
        "`inside spread?` compares |jax − torch mean| against "
        "max(2·std, range) of the torch controls.")

    if args.f10k:
        s10 = load_scores(args.f10k)
        if s10:
            lines += [
                "",
                "### Fusion-horizon check (torch, fusion stage "
                f"{s10.get('iters_fusion', '?')} iters)",
                "",
                "| output | torch@2500-fusion (offset 0) | torch@"
                f"{s10.get('iters_fusion', '?')}-fusion |",
                "|---|---|---|",
            ]
            base = scores[0][1]
            for key in KEYS:
                lines.append(f"| {key} | {base[key]['psnr']:.3f} | "
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
