"""Rich progress extras (reference utils/rich_utils.py:10-22)."""
from __future__ import annotations

try:
    from rich.progress import ProgressColumn
    from rich.text import Text
except ImportError:                      # pragma: no cover
    ProgressColumn = object
    Text = None


class ItersPerSecColumn(ProgressColumn):
    """Iterations-per-second column for the render progress bar."""

    def __init__(self, suffix: str = "it/s"):
        super().__init__()
        self.suffix = suffix

    def render(self, task):
        speed = task.finished_speed or task.speed
        if speed is None:
            return Text("?", style="progress.data.speed")
        return Text(f"{speed:.2f} {self.suffix}",
                    style="progress.data.speed")
