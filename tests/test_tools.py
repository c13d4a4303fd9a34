"""utils.tools: TicToc / timing / folder_path (reference utils/tools.py)."""
import os
import time

from adapt_tpu.utils.tools import TicToc, timing, folder_path


def test_tictoc():
    t = TicToc()
    time.sleep(0.01)
    dt = t.toc_tic()
    assert 0.005 < dt < 5.0
    assert t.toc() < 1.0             # reset happened (no tight race)


def test_timing_decorator(capsys):
    @timing("lbl")
    def f(x):
        return x + 1

    assert f(1) == 2
    assert "[timing] lbl:" in capsys.readouterr().out


def test_folder_path(tmp_path):
    p = os.path.join(str(tmp_path), "a", "b")
    assert folder_path(p) == p and os.path.isdir(p)
