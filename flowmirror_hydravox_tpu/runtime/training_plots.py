"""Training observability: log parsing + loss-curve rendering.

Reference equivalent: user_interface/tabs/training_tab.py:427-824 regex-parses
training logs into loss/eval curves and renders a matplotlib PNG to
<output_dir>/figure/training_plot.png.  Same here, against our trainer log
format (`step N loss X acc Y gnorm Z`)."""

from __future__ import annotations

import os
import re
from typing import Dict, List

_STEP_RE = re.compile(
    r"step (\d+) loss ([\d.eE+-]+)(?: acc ([\d.eE+-]+))?(?:.*?gnorm ([\d.naif]+))?"
)
_EVAL_RE = re.compile(r"eval step (\d+) loss ([\d.eE+-]+)")


def parse_training_logs(log_text: str) -> Dict[str, List]:
    """Extract step/loss/acc + eval curves from a trainer log."""
    steps, losses, accs = [], [], []
    eval_steps, eval_losses = [], []
    for line in log_text.splitlines():
        m = _EVAL_RE.search(line)
        if m:
            eval_steps.append(int(m.group(1)))
            eval_losses.append(float(m.group(2)))
            continue
        m = _STEP_RE.search(line)
        if m:
            steps.append(int(m.group(1)))
            losses.append(float(m.group(2)))
            if m.group(3):
                accs.append(float(m.group(3)))
    return {
        "steps": steps, "losses": losses, "accs": accs,
        "eval_steps": eval_steps, "eval_losses": eval_losses,
    }


def generate_training_plot(log_path: str, output_dir: str) -> str:
    """Render loss/acc curves to <output_dir>/figure/training_plot.png
    (training_tab.py:594-824 equivalent). Returns the png path."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    with open(log_path) as f:
        data = parse_training_logs(f.read())

    fig, ax1 = plt.subplots(figsize=(9, 5))
    if data["steps"]:
        ax1.plot(data["steps"], data["losses"], label="train loss", color="#2374ab")
    if data["eval_steps"]:
        ax1.plot(data["eval_steps"], data["eval_losses"], label="eval loss",
                 color="#ab3b23", marker="o")
    ax1.set_xlabel("step")
    ax1.set_ylabel("loss")
    ax1.legend(loc="upper right")
    ax1.grid(alpha=0.3)
    if data["accs"] and len(data["accs"]) == len(data["steps"]):
        ax2 = ax1.twinx()
        ax2.plot(data["steps"], data["accs"], label="acc", color="#3fa34d", alpha=0.6)
        ax2.set_ylabel("accuracy")
    fig.tight_layout()

    fig_dir = os.path.join(output_dir, "figure")
    os.makedirs(fig_dir, exist_ok=True)
    path = os.path.join(fig_dir, "training_plot.png")
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path
