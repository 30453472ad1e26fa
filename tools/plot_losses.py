"""Plot training loss curves from a run's metrics.csv (matplotlib).

Counterpart of the reference's manual MATLAB inspection of the per-epoch
losses_epoch<i>.mat dumps (train_*.py:671-683; our Trainer writes both the
.mat files and a consolidated CSV).

Usage: python tools/plot_losses.py runs/train/losses/metrics.csv [out.png]
"""

import csv
import sys


def main() -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    csv_path = sys.argv[1] if len(sys.argv) > 1 else "runs/train/losses/metrics.csv"
    out_path = sys.argv[2] if len(sys.argv) > 2 else csv_path.replace(".csv", ".png")

    with open(csv_path) as f:
        rows = list(csv.DictReader(f))
    if not rows:
        raise SystemExit("no rows in " + csv_path)

    epochs = [float(r["epoch"]) for r in rows]
    keys = [
        k for k in rows[0]
        if k not in ("epoch", "seconds") and not k.startswith("discriminator_")
    ]
    fig, ax = plt.subplots(figsize=(9, 5))
    for key in sorted(keys):
        ax.plot(epochs, [float(r[key]) for r in rows], label=key, linewidth=1.2)
    ax.set_xlabel("epoch")
    ax.set_ylabel("loss")
    ax.set_yscale("log")
    ax.legend(fontsize=8, ncol=2)
    ax.set_title("training losses")
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    print(out_path)


if __name__ == "__main__":
    main()
