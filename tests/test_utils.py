"""Logger / sparkline / log-reparse tests (reference misc.py:95-217,
sparks.py)."""

import json

from multimodalgame_tpu.utils.logging import (FileLogger, VisdomLogger,
                                              read_log_load)
from multimodalgame_tpu.utils.sparks import bin_to_alpha, sparks


def test_sparks_rendering():
    # Bar heights follow round(x / (max/8)) (reference sparks.py:12-14).
    assert sparks([1.0]) == "▉"
    assert sparks([0.0, 1.0]) == " ▉"
    s = sparks([1] + [0.5])[1:]  # the driver's [1]+probs scaling trick
    assert s == "▄"
    assert len(sparks([0.1, 0.5, 0.9, 1.0])) == 4


def test_bin_to_alpha():
    # 5 bits per symbol, offset 'A' (reference model.py:991-998).
    assert bin_to_alpha("00000") == "A"
    assert bin_to_alpha("00001") == "B"
    assert bin_to_alpha("0000000001") == "A B"


def test_file_logger_format(tmp_path, capsys):
    path = str(tmp_path / "x.log")
    lg = FileLogger(path)
    lg.Log("hello world")
    line = open(path).read().strip()
    # "yy-mm-dd HH:MM:SS [1] message" (misc.py:180-183)
    assert line.endswith("[1] hello world")
    assert len(line.split(" ")[0].split("-")) == 3


def test_file_logger_levels(tmp_path):
    path = str(tmp_path / "x.log")
    lg = FileLogger(path, min_file_level=FileLogger.WARNING)
    lg.Log("info msg", level=FileLogger.INFO)
    lg.Log("warn msg", level=FileLogger.WARNING)
    content = open(path).read()
    assert "info msg" not in content
    assert "warn msg" in content


def test_visdom_logger_history_buffer():
    lg = VisdomLogger(enabled=False)
    lg.log("Loss", 1.0, step=0)
    lg.log("Loss", 0.5, step=1)
    assert lg.history["Loss"] == [(0, 1.0), (1, 0.5)]


def test_read_log_load(tmp_path):
    path = str(tmp_path / "x.log")
    lg = FileLogger(path)
    lg.Log("Flag Values:\n" + json.dumps({"a": 1, "b": "x"}, indent=4))
    lg.Log("other stuff")
    assert read_log_load(path) == {"a": 1, "b": "x"}


class _ModernVisdomStub:
    """Mimics visdom >= 0.1.7: line() supports update="append" and
    returns the window id (or the sentinel string when absent)."""

    def __init__(self):
        self.calls = []
        self.windows = set()

    def line(self, X, Y, win=None, env=None, name=None, update=None,
             opts=None):
        self.calls.append(("line", win, update, len(X)))
        if update == "append" and win not in self.windows:
            return "win does not exist"
        self.windows.add(win)
        return win


class _LegacyVisdomStub:
    """Mimics the pre-0.1.7 API the reference used (misc.py:135-140):
    line() has no update/name kwargs; appends go through updateTrace."""

    def __init__(self):
        self.calls = []
        self.windows = set()

    def line(self, X, Y, win=None, env=None, opts=None):
        self.calls.append(("line", win, len(X)))
        self.windows.add(win)
        return win

    def updateTrace(self, X, Y, name=None, win=None, env=None,
                    append=None):
        self.calls.append(("updateTrace", win, len(X)))
        if win not in self.windows:
            return "win does not exist"
        return win


def test_visdom_logger_modern_server():
    viz = _ModernVisdomStub()
    lg = VisdomLogger(enabled=True, viz=viz, experiment_name="e")
    lg.log("Loss", 1.0, step=0)
    assert viz.calls == []                  # buffered below minimum
    lg.log("Loss", 0.5, step=1)             # flush: append -> create
    assert viz.calls[0] == ("line", "Loss", "append", 2)
    assert viz.calls[1] == ("line", "Loss", None, 2)
    lg.log("Loss", 0.4, step=2)
    lg.log("Loss", 0.3, step=3)             # second flush: plain append
    assert viz.calls[2] == ("line", "Loss", "append", 2)
    assert len(viz.calls) == 3
    assert lg.history["Loss"] == [(0, 1.0), (1, 0.5), (2, 0.4), (3, 0.3)]


def test_visdom_logger_legacy_server():
    viz = _LegacyVisdomStub()
    lg = VisdomLogger(enabled=True, viz=viz, experiment_name="e")
    lg.log("Acc", 0.1, step=0)
    lg.log("Acc", 0.2, step=1)
    # line(update=...) raised TypeError -> updateTrace -> create via line.
    assert viz.calls == [("updateTrace", "Acc", 2), ("line", "Acc", 2)]
    lg.log("Acc", 0.3, step=2)
    lg.log("Acc", 0.4, step=3)
    assert viz.calls[2] == ("updateTrace", "Acc", 2)


def test_compile_cache_opt_in_only(monkeypatch, tmp_path):
    """The persistent XLA cache stays OFF unless explicitly requested:
    reloading XLA:CPU AOT entries aborts the process on some hosts —
    both cross-machine entries and, on the machine this was debugged
    on, entries it wrote itself (utils/compile_cache.py)."""
    from multimodalgame_tpu.utils import compile_cache

    monkeypatch.delenv("JAX_COMPILATION_CACHE_DIR", raising=False)
    assert compile_cache.cache_dir(str(tmp_path)) is None
    # An explicit override is an informed opt-in: honored as-is.
    monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", "/x/y")
    assert compile_cache.cache_dir(str(tmp_path)) == "/x/y"
    # The fingerprint helper stays available for scoping opt-in dirs.
    fp = compile_cache.host_fingerprint()
    assert len(fp) == 12 and all(c in "0123456789abcdef" for c in fp)
    assert fp == compile_cache.host_fingerprint()  # stable
