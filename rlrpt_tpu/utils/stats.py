"""Training-stats logging.

The reference appends `avg_path_length loss zero_contribution_paths` lines
to text files per frame (ref: main.cu:335-339 sarsa_training_stats.txt,
neural_q_pathtracer.cu:577-583 nn_training_stats.txt); Graphing/
training_curve_generator.py plots them.  Same format here.
"""

from __future__ import annotations

import os
from typing import Iterable


class StatsLogger:
    def __init__(self, path: str, reset: bool = False):
        self.path = path
        if reset and os.path.exists(path):
            os.remove(path)

    def append(self, avg_path_length: float, loss: float,
               zero_contribution_paths: int) -> None:
        with open(self.path, "a") as f:
            f.write(f"{float(avg_path_length)} {float(loss)} "
                    f"{int(zero_contribution_paths)}\n")


def read_stats(path: str) -> list[tuple[float, float, int]]:
    rows = []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) >= 3:
                rows.append((float(parts[0]), float(parts[1]), int(float(parts[2]))))
    return rows
