#!/usr/bin/env python
"""Plot per-epoch meter averages from a .st stats file (reference: plot_stats.py:5-27)."""
from __future__ import annotations

import argparse

parser = argparse.ArgumentParser("training stats plotting script")
parser.add_argument("--statsPath", type=str, required=True, help="path to a .st file")
parser.add_argument("--out", type=str, default=None,
                    help="save the figure instead of showing it")


def main():
    options = parser.parse_args()
    import matplotlib
    if options.out:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from meshrcnn_tpu.utils.meters import load_stats

    stats = load_stats(options.statsPath)
    for key, rec in stats.items():
        history = rec["history"] if isinstance(rec, dict) else rec
        if not history:
            continue
        plt.figure()
        plt.plot(range(len(history)), history)
        plt.title(rec["name"] if isinstance(rec, dict) else key)
        plt.xlabel("epoch")
        plt.ylabel("epoch average")
        if options.out:
            plt.savefig(f"{options.out}_{key}.png")
    if not options.out:
        plt.show()


if __name__ == "__main__":
    main()
