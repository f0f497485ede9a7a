"""Persistent training log artifact.

The reference accumulates every printed line in args.log and flushes it to
<out>/log.txt when the run ends (classifier/train.py:309-315), after
printing a model summary at startup (train.py:242-244).  RunLog is the
framework-wide equivalent: a tee'd log_fn whose lines are written next to
the run's checkpoints - flushed incrementally so even a killed run leaves
its log.
"""

from pathlib import Path

import jax


class RunLog:
    """Callable log_fn that tees to `log_fn` (default print) and, when
    `path` is set, appends each line to the log file as it arrives."""

    def __init__(self, path: str | Path | None = None, log_fn=print,
                 append: bool = False):
        self._fn = log_fn
        self.lines: list[str] = []
        self.path = Path(path) if path is not None else None
        if self.path is not None:
            self.path.parent.mkdir(parents=True, exist_ok=True)
            if not (append and self.path.exists()):
                self.path.write_text("")  # fresh run, fresh log

    def __call__(self, line):
        line = str(line)
        self.lines.append(line)
        self._fn(line)
        if self.path is not None:
            with open(self.path, "a") as f:
                f.write(line + "\n")


def param_summary(params, name: str = "model") -> str:
    """One-line parameter-count summary (the reference prints the full
    torchsummary table, train.py:242-244; the count is the durable part)."""
    leaves = jax.tree.leaves(params)
    n = sum(int(x.size) for x in leaves)
    return f"{name}: {n:,} parameters in {len(leaves)} arrays"
