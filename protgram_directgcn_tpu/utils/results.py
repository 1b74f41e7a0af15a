"""Evaluation reporting: ranking metrics, plots, summary + statistics.

Equivalent of the reference's EvaluationReporter
(reference: src/utils/results_utils.py:19-292): Hits@k (recall@k), NDCG@k,
training-history / ROC / bar-chart plots, and a text summary with Wilcoxon
signed-rank + Pearson statistics across fold scores.
"""

from __future__ import annotations

import math
import os
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

from protgram_directgcn_tpu.utils.io import logger


def ranking_metrics(y_true: np.ndarray, y_score: np.ndarray, k_list: Sequence[int]) -> Dict[str, float]:
    """Hits@k (recall@k) and NDCG@k (reference: results_utils.py:40-95)."""
    order = np.argsort(y_score)[::-1]
    sorted_true = np.asarray(y_true, dtype=np.float64)[order]
    metrics: Dict[str, float] = {}
    total_pos = float(np.sum(y_true))
    if total_pos == 0:
        for k in k_list:
            metrics[f"hits_at_{k}"] = 0.0
            metrics[f"ndcg_at_{k}"] = 0.0
        return metrics
    ideal = np.sort(np.asarray(y_true, dtype=np.float64))[::-1]
    for k in k_list:
        ak = min(k, len(sorted_true))
        if ak == 0:
            metrics[f"hits_at_{k}"] = 0.0
            metrics[f"ndcg_at_{k}"] = 0.0
            continue
        metrics[f"hits_at_{k}"] = float(np.sum(sorted_true[:ak]) / total_pos)
        discounts = np.log2(np.arange(1, ak + 1) + 1)
        dcg = float(np.sum(sorted_true[:ak] / discounts))
        idcg = float(np.sum(ideal[:ak] / discounts))
        metrics[f"ndcg_at_{k}"] = dcg / idcg if idcg > 0 else 0.0
    return metrics


def binary_classification_metrics(y_true: np.ndarray, y_proba: np.ndarray, threshold: float = 0.5) -> Dict[str, float]:
    """AUC / F1 / precision / recall / accuracy."""
    from sklearn.metrics import (
        accuracy_score,
        f1_score,
        precision_score,
        recall_score,
        roc_auc_score,
    )

    y_pred = (y_proba > threshold).astype(int)
    out = {
        "f1": float(f1_score(y_true, y_pred, zero_division=0)),
        "precision": float(precision_score(y_true, y_pred, zero_division=0)),
        "recall": float(recall_score(y_true, y_pred, zero_division=0)),
        "accuracy": float(accuracy_score(y_true, y_pred)),
    }
    try:
        out["auc"] = float(roc_auc_score(y_true, y_proba))
    except ValueError:
        out["auc"] = float("nan")
    return out


class EvaluationReporter:
    """Plots + summary text + fold statistics (reference: results_utils.py:19-292)."""

    def __init__(self, base_output_dir: os.PathLike, k_vals_table: Sequence[int]):
        self.base_output_dir = Path(base_output_dir)
        self.plots_dir = self.base_output_dir / "plots"
        self.plots_dir.mkdir(parents=True, exist_ok=True)
        self.k_vals_table = list(k_vals_table)

    # -- plots ---------------------------------------------------------

    def plot_training_history(self, history: Dict[str, List[float]], model_name: str) -> Optional[Path]:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        if not history:
            return None
        path = self.plots_dir / f"history_{model_name.replace(' ', '_')}.png"
        plt.figure(figsize=(12, 5))
        plt.subplot(1, 2, 1)
        for key in ("loss", "val_loss"):
            if history.get(key):
                plt.plot(history[key], label=key)
        plt.title(f"Loss: {model_name}")
        plt.xlabel("Epoch")
        plt.legend()
        plt.grid(True)
        plt.subplot(1, 2, 2)
        for key in ("accuracy", "val_accuracy"):
            if history.get(key):
                plt.plot(history[key], label=key)
        plt.title(f"Accuracy: {model_name}")
        plt.xlabel("Epoch")
        plt.legend()
        plt.grid(True)
        plt.tight_layout()
        plt.savefig(path)
        plt.close()
        return path

    def plot_roc_curves(self, results_list: List[Dict[str, Any]]) -> Optional[Path]:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        path = self.plots_dir / "comparison_roc_curves.png"
        plt.figure(figsize=(10, 8))
        plotted = False
        for res in results_list:
            roc = res.get("roc_data_representative")
            if roc is not None and len(roc[0]):
                fpr, tpr = roc[0], roc[1]
                plt.plot(fpr, tpr, lw=2,
                         label=f"{res.get('embedding_name', '?')} (AUC={res.get('test_auc', 0):.4f})")
                plotted = True
        if not plotted:
            plt.close()
            return None
        plt.plot([0, 1], [0, 1], "k--", label="Random")
        plt.xlabel("False Positive Rate")
        plt.ylabel("True Positive Rate")
        plt.title("ROC Curves Comparison (first fold)")
        plt.legend(loc="lower right")
        plt.grid(True)
        plt.savefig(path)
        plt.close()
        return path

    def plot_comparison_charts(self, results_list: List[Dict[str, Any]]) -> Optional[Path]:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        if not results_list:
            return None
        path = self.plots_dir / "comparison_metrics_barchart.png"
        metrics = {"AUC": "test_auc", "F1": "test_f1", "Precision": "test_precision", "Recall": "test_recall"}
        for k in self.k_vals_table:
            metrics[f"Hits@{k}"] = f"test_hits_at_{k}"
            metrics[f"NDCG@{k}"] = f"test_ndcg_at_{k}"
        names = [r.get("embedding_name", "?") for r in results_list]
        cols = min(3, len(metrics))
        rows = math.ceil(len(metrics) / cols)
        plt.figure(figsize=(cols * 6, rows * 5))
        for i, (title, key) in enumerate(metrics.items()):
            plt.subplot(rows, cols, i + 1)
            vals = [r.get(key, 0) for r in results_list]
            plt.bar(names, vals)
            plt.title(title)
            plt.xticks(rotation=45, ha="right")
        plt.suptitle("Model Performance Comparison")
        plt.tight_layout()
        plt.savefig(path)
        plt.close()
        return path

    # -- summary -------------------------------------------------------

    def write_summary_file(
        self, results_list: List[Dict[str, Any]], main_emb_name: str, test_metric: str, alpha: float
    ) -> Optional[Path]:
        """Performance table + Wilcoxon/Pearson statistics
        (reference: results_utils.py:225-292)."""
        from scipy.stats import pearsonr, wilcoxon

        if not results_list:
            return None
        path = self.base_output_dir / "evaluation_summary.txt"
        with open(path, "w") as f:
            f.write("--- Overall Performance Comparison Table (Averaged over Folds) ---\n")
            headers = ["Embedding Name", "AUC", "F1", "Precision", "Recall"]
            for k in self.k_vals_table:
                headers += [f"Hits@{k}", f"NDCG@{k}"]
            headers += ["AUC StdDev", "F1 StdDev"]
            f.write(" | ".join(f"{h:>14}" for h in headers) + "\n")
            for res in results_list:
                row = [f"{res.get('embedding_name', 'N/A'):>14}"]
                for key in ("test_auc", "test_f1", "test_precision", "test_recall"):
                    row.append(f"{res.get(key, 0):>14.4f}")
                for k in self.k_vals_table:
                    row.append(f"{res.get(f'test_hits_at_{k}', 0):>14.4f}")
                    row.append(f"{res.get(f'test_ndcg_at_{k}', 0):>14.4f}")
                row.append(f"{res.get('test_auc_std', 0):>14.4f}")
                row.append(f"{res.get('test_f1_std', 0):>14.4f}")
                f.write(" | ".join(row) + "\n")
            f.write("\n")

            f.write(
                f"--- Statistical Comparison vs '{main_emb_name}' on '{test_metric}' (alpha={alpha}) ---\n"
            )
            main = next((r for r in results_list if r.get("embedding_name") == main_emb_name), None)
            scores_key = "fold_auc_scores" if test_metric == "test_auc" else "fold_f1_scores"
            if main and main.get(scores_key):
                main_scores = [s for s in main[scores_key] if not np.isnan(s)]
                for other in (r for r in results_list if r.get("embedding_name") != main_emb_name):
                    other_scores = [s for s in other.get(scores_key, []) if not np.isnan(s)]
                    if len(main_scores) == len(other_scores) and len(main_scores) > 1:
                        if np.allclose(main_scores, other_scores):
                            p_val, conclusion = 1.0, "Identical scores"
                        else:
                            _, p_val = wilcoxon(main_scores, other_scores)
                            conclusion = f"Yes (p < {alpha})" if p_val < alpha else "No"
                        if len(np.unique(main_scores)) > 1 and len(np.unique(other_scores)) > 1:
                            r_corr, _ = pearsonr(main_scores, other_scores)
                        else:
                            r_corr = float("nan")
                        f.write(
                            f"{other.get('embedding_name', '?'):<30} | p={p_val:.4e} | {conclusion:<20} | r={r_corr:.4f}\n"
                        )
                    else:
                        f.write(f"{other.get('embedding_name', '?'):<30} | N/A (fold mismatch)\n")
            else:
                f.write(f"Could not perform stats: '{main_emb_name}' scores missing.\n")
        logger.info("summary saved to %s", path)
        return path
