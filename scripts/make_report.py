"""Render benchmark/metric artifacts into one markdown report.

The reference presents its results through a hand-run notebook
(/root/reference/src/visualization.ipynb: J-vs-fps teaser, e-OSVOS-T
runtime curve, lr analysis) and live Visdom dashboards. The TPU rebuild
logs everything as json/jsonl; this script is the notebook's CLI
equivalent — it assembles:

  - the headline fps rows (BENCH_*.json written by bench.py /
    scripts/bench_detection*.py) against the V100 anchors,
  - the e-OSVOS-T runtime sweep (BENCH_SWEEP.json) vs the reference's
    paper-figure numbers,
  - training curves (meta_loss, lr mean/std, per-tensor lr extremes) and
    eval history from a run's metrics.jsonl,

into REPORT.md (or --out). Pure python/stdlib — safe to run anywhere.

Usage: python scripts/make_report.py [--run-dir models] [--out REPORT.md]
"""

from __future__ import annotations

import argparse
import glob
import json
import os


def _read_json(path):
    try:
        with open(path) as f:
            return json.load(f)
    except Exception:
        return None


def _read_jsonl(path):
    rows = []
    try:
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line:
                    rows.append(json.loads(line))
    except Exception:
        pass
    return rows


def _spark(values, width=40):
    """Tiny text sparkline for a numeric series."""
    if not values:
        return ""
    blocks = "▁▂▃▄▅▆▇█"
    lo, hi = min(values), max(values)
    if hi <= lo:
        return blocks[0] * min(len(values), width)
    step = max(1, len(values) // width)
    vs = values[::step][:width]
    return "".join(
        blocks[int((v - lo) / (hi - lo) * (len(blocks) - 1))] for v in vs
    )


def headline_section(repo):
    lines = ["## Headline benchmarks (one TPU chip, 480p, incl. fine-tune)",
             "",
             "| metric | fps | vs V100 reference |",
             "|---|---|---|"]
    found = False
    for path in sorted(glob.glob(os.path.join(repo, "BENCH_*.json"))):
        data = _read_json(path)
        if data is None:
            continue
        rows = data if isinstance(data, list) else [data.get("parsed", data)]
        for r in rows:
            if not isinstance(r, dict) or "metric" not in r:
                continue
            lines.append(
                f"| `{r['metric']}` | {r.get('value')} | "
                f"{r.get('vs_baseline')}× |"
            )
            found = True
    return lines if found else []


def sweep_section(repo):
    data = _read_json(os.path.join(repo, "BENCH_SWEEP.json"))
    if not data:
        return []
    lines = ["## e-OSVOS-T runtime curve (reference paper figure, "
             "visualization.ipynb cell 5)",
             "",
             "| fine-tune steps T | ours s/frame | reference s/frame | "
             "speedup |",
             "|---|---|---|---|"]
    for r in data:
        lines.append(
            f"| {r['T']} | {r['s_per_frame']} | {r['ref_s_per_frame']} | "
            f"{r['speedup_vs_ref']}× |"
        )
    return lines


def run_section(run_dir):
    rows = _read_jsonl(os.path.join(run_dir, "metrics.jsonl"))
    if not rows:
        return []
    lines = [f"## Training run `{run_dir}`", ""]
    train = [r for r in rows if r.get("event") == "meta_train"]
    if train:
        losses = [r["meta_loss"] for r in train]
        lines += [
            f"- meta-iterations logged: {len(train)} "
            f"(loss {losses[0]:.4f} → {losses[-1]:.4f})",
            f"- meta_loss: `{_spark(losses)}`",
        ]
        lr_rows = [r for r in train if "lr_mean" in r]
        if lr_rows:
            lines.append(
                f"- init-lr mean {lr_rows[-1]['lr_mean']:.3e} "
                f"± {lr_rows[-1]['lr_std']:.3e}"
            )
        if train and "lr_per_tensor" in train[-1]:
            per = train[-1]["lr_per_tensor"]
            hi = sorted(per.items(), key=lambda kv: -kv[1])[:3]
            lo = sorted(per.items(), key=lambda kv: kv[1])[:3]
            lines.append("- highest per-tensor lrs: " + ", ".join(
                f"`{k}`={v:.2e}" for k, v in hi))
            lines.append("- lowest per-tensor lrs: " + ", ".join(
                f"`{k}`={v:.2e}" for k, v in lo))
    evals = [r for r in rows if r.get("event") == "eval"]
    if evals:
        js = [r["J_mean"] for r in evals]
        lines.append(
            f"- eval J_mean: {js[0]:.4f} → {js[-1]:.4f} `{_spark(js)}`"
        )
        init_j = [r["init_J_mean"] for r in evals if "init_J_mean" in r]
        if init_j:
            lines.append(f"- init_J (pre-fine-tune baseline): {init_j[0]:.4f}")
    ev_rows = _read_jsonl(os.path.join(run_dir, "eval_metrics.jsonl"))
    seqs = [r for r in ev_rows if r.get("event") == "eval_seq"]
    if seqs:
        lines += ["", "| sequence | J | F | fps |", "|---|---|---|---|"]
        for r in seqs:
            lines.append(
                f"| {r['seq']} | {r.get('J_mean', float('nan')):.4f} | "
                f"{r.get('F_mean', float('nan')):.4f} | "
                f"{r.get('fps', float('nan')):.2f} |"
            )
    return lines


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--repo", default=os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    ap.add_argument("--run-dir", default="models",
                    help="directory holding metrics.jsonl/eval_metrics.jsonl")
    ap.add_argument("--out", default="REPORT.md")
    args = ap.parse_args(argv)

    sections = [["# e-OSVOS-TPU results report", ""]]
    sections.append(headline_section(args.repo))
    sections.append(sweep_section(args.repo))
    sections.append(run_section(args.run_dir))
    body = "\n".join("\n".join(s) + "\n" for s in sections if s)
    with open(args.out, "w") as f:
        f.write(body)
    print(f"wrote {args.out} ({len(body)} bytes)")


if __name__ == "__main__":
    main()
