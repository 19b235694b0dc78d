"""Render RESULTS.json (from run_all_presets.py) into RESULTS.md."""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

ORDER = ["flagship", "flagship_bf16", "flagship_bf16sr", "flagship_flat", "model1", "model2", "model3", "model4", "model5",
         "gcn", "graphsage", "gat", "gat_gcn", "gin", "chebnet",
         "morgan1024", "morgan2048", "ecfp2048", "fcfp", "maccs",
         "smifp", "bci"]

DESC = {
    "flagship": "hybrid M-GAT-GraphSAGE + ECFP-CNN + KL (reference train.py)",
    "flagship_bf16": "flagship in the bf16 mixed-precision production config",
    "flagship_bf16sr": "flagship w/ bf16 master params + stochastic rounding (HBM-capacity mode; measured slower than flagship_bf16)",
    "flagship_flat": "flagship with the reference's batch-global attention quirk",
    "model1": "ablation 1: PyG-style GAT(h=10)+SAGE, dual pool",
    "model2": "ablation 2: ModifiedGAT w/o +V residual",
    "model3": "ablation 3: + residual",
    "model4": "ablation 4: + CNN branch, plain MSE",
    "model5": "ablation 5: + KL loss",
    "gcn": "GCN baseline (5-dim features, 10 epochs)",
    "graphsage": "GraphSAGE baseline",
    "gat": "GAT baseline (10 heads)",
    "gat_gcn": "GAT+GCN baseline",
    "gin": "GIN baseline (5 layers + BN)",
    "chebnet": "ChebNet baseline (custom pseudo-Laplacian)",
    "morgan1024": "w/ Morgan-1024 (== flagship: reference morgan=1024.py:55-59 computes the same r=2/1024 Morgan bits as train.py get_ecfp)", "morgan2048": "w/ Morgan-2048",
    "ecfp2048": "w/ ECFP-2048 (wide CNN)", "fcfp": "w/ FCFP",
    "maccs": "w/ MACCS-167", "smifp": "w/ SMIFP n-gram", "bci": "w/ BCI",
}


def main(results_path="RESULTS.json", out_path="RESULTS.md"):
    rows = {r["preset"]: r for r in json.load(open(results_path))}
    lines = [
        "# RESULTS — bundled-split metrics, trained on one TPU v5e chip",
        "",
        "Independent 961-molecule test set (`datasets/test_data.csv`);",
        "every preset trained with its reference hyperparameters",
        "(`train/config.py`), best checkpoint selected on validation.",
        "",
        "| preset | what | epochs | train time | test MSE | RMSE | MAE | Pearson r | R2 |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    for name in ORDER:
        r = rows.get(name)
        if not r:
            continue
        lines.append(
            f"| {name} | {DESC.get(name, '')} | {r['epochs']} | "
            f"{r['train_time_s']:.0f}s | {r['mse']:.4f} | {r['rmse']:.4f} "
            f"| {r['mae']:.4f} | {r['pearson_r']:.4f} | {r['r2']:.4f} |")
    extra = [n for n in rows if n not in ORDER]
    for name in extra:
        r = rows[name]
        lines.append(
            f"| {name} |  | {r['epochs']} | {r['train_time_s']:.0f}s | "
            f"{r['mse']:.4f} | {r['rmse']:.4f} | {r['mae']:.4f} | "
            f"{r['pearson_r']:.4f} | {r['r2']:.4f} |")
    seed_path = os.path.join(os.path.dirname(results_path) or ".",
                             "SEED_REPEAT.json")
    if os.path.exists(seed_path):
        sr = json.load(open(seed_path))
        lines += [
            "",
            "## Seed-repeat study (f32 vs bf16 production config)",
            "",
            f"Full reference recipe, seeds {sr['seeds']} "
            "(`scripts/seed_repeat.py`, SEED_REPEAT.json):",
            "",
            "| config | test MSE | RMSE | Pearson r |",
            "|---|---|---|---|",
        ]
        for preset in ("flagship", "flagship_bf16"):
            cells = []
            for key in ("mse", "rmse", "pearson_r"):
                s = sr["summary"][f"{preset}.{key}"]
                cells.append(f"{s['mean']:.4f} ± {s['std']:.4f}")
            lines.append(f"| {preset} | " + " | ".join(cells) + " |")
        m_f32 = sr["summary"]["flagship.mse"]
        m_bf16 = sr["summary"]["flagship_bf16.mse"]
        overlap = (m_f32["min"] <= m_bf16["max"]
                   and m_bf16["min"] <= m_f32["max"])
        lines.append(
            "\nThe per-seed ranges "
            f"({m_f32['min']}–{m_f32['max']} f32 vs "
            f"{m_bf16['min']}–{m_bf16['max']} bf16) "
            + ("overlap: the bf16 production config is metric-neutral "
               "within run-to-run variance."
               if overlap else
               "do NOT overlap: the bf16 config shifts test MSE "
               "beyond run-to-run variance on these seeds."))
    lines += [
        "",
        "Throughput context: the flagship's full reference recipe "
        "(1000 epochs, batch 128, 3000 molecules) completes in ~11 min "
        "wall-clock on the tunneled chip; the measured PyTorch-CPU "
        "baseline (64 molecules/s) would need ~13 hours.",
        "",
        "The dataset is the bundled synthetic split (the reference ships "
        "no data); metrics are not comparable to any published ChEMBL "
        "numbers, only across models on this data.",
    ]
    with open(out_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out_path} ({len(rows)} presets)")


if __name__ == "__main__":
    main(*sys.argv[1:])
