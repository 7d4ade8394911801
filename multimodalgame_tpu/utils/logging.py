"""Observability: file logger, metric logger, and log re-parsing.

Parity targets: ``FileLogger`` (reference misc.py:153-190) — leveled
stderr + append-to-file with a ``%y-%m-%d %H:%M:%S [level] message`` line
format, reopening the file per write so network filesystems stay in sync;
``VisdomLogger`` (misc.py:95-151) — buffers >=2 points per key before
shipping them to a Visdom server; ``read_log_load`` (misc.py:193-217) —
re-parses the "Flag Values" JSON block out of a training log.
"""

from __future__ import annotations

import datetime
import json
import sys
from typing import Any, Dict, List, Optional, Tuple


class FileLogger:
    """Leveled logger writing to stderr and (re-opened per write) to a file."""

    DEBUG = 0
    INFO = 1
    WARNING = 2
    ERROR = 3

    def __init__(self, log_path: Optional[str] = None,
                 json_log_path: Optional[str] = None,
                 min_print_level: int = 0, min_file_level: int = 0):
        self.log_path = log_path
        self.json_log_path = json_log_path
        self.min_print_level = min_print_level
        self.min_file_level = min_file_level

    def Log(self, message: str, level: int = INFO) -> None:
        if level >= self.min_print_level:
            sys.stderr.write("[%i] %s\n" % (level, message))
        if self.log_path and level >= self.min_file_level:
            with open(self.log_path, "a") as f:
                datetime_string = datetime.datetime.now().strftime(
                    "%y-%m-%d %H:%M:%S")
                f.write("%s [%i] %s\n" % (datetime_string, level, message))

    def LogJSON(self, message_obj: Any, level: int = INFO) -> None:
        """Overwrite ``json_log_path`` with one JSON object.

        Faithful to the reference (misc.py:185-190) including its quirks:
        mode ``"w"`` truncates on every call (the single caller writes the
        flag dump exactly once per run, model.py:1009-1011 — these are
        overwrite semantics, not an append log), and a level filtered
        below ``min_file_level`` falls into the no-filename warning branch
        even when a filename is set."""
        if self.json_log_path and level >= self.min_file_level:
            with open(self.json_log_path, "w") as f:
                print(json.dumps(message_obj), file=f)
        else:
            sys.stderr.write("WARNING: No JSON log filename.")


class VisdomLogger:
    """Buffered live-metric logger.

    Metrics accumulate per key; once ``minimum`` (2) points exist they are
    flushed to a Visdom server if one is enabled, mirroring misc.py:95-151.
    When Visdom is unavailable the logger degrades to an in-memory metric
    store (``history``) that drivers and tests can inspect.
    """

    def __init__(self, env: str = "main", experiment_name: str = "",
                 minimum: int = 2, enabled: bool = False, viz=None):
        self.enabled = enabled
        self.experiment_name = experiment_name
        self.env = env
        self.minimum = minimum
        self.q: Dict[str, List[Tuple[int, float]]] = {}
        self.history: Dict[str, List[Tuple[int, float]]] = {}
        self.viz = viz
        if enabled and viz is None:
            try:
                from visdom import Visdom  # type: ignore
                self.viz = Visdom()
            except Exception:
                self.viz = None

    def get_metrics(self, key, val, step):
        metric = self.q.setdefault(key, [])
        metric.append((step, val))
        if len(metric) >= self.minimum:
            del self.q[key]
            return metric
        return None

    def _ship(self, key, steps, vals) -> None:
        """Send one trace update, preferring the modern API.

        The reference called ``viz.updateTrace`` (misc.py:135-140), an API
        visdom removed years ago; modern servers take
        ``line(..., update="append")``, which creates the window when it
        doesn't exist. The legacy call remains as a fallback for old
        servers.
        """
        opts = {"legend": [self.experiment_name], "title": key}
        try:
            win = self.viz.line(X=steps, Y=vals, win=key, env=self.env,
                                name=self.experiment_name,
                                update="append", opts=opts)
        except TypeError:
            # Ancient visdom: line() has no update kwarg; appending went
            # through the since-removed updateTrace.
            win = self.viz.updateTrace(X=steps, Y=vals,
                                       name=self.experiment_name, win=key,
                                       env=self.env, append=True)
        if win == "win does not exist":
            self.viz.line(X=steps, Y=vals, win=key, env=self.env,
                          opts=opts)

    def log(self, key: str, val: float, step: int) -> None:
        self.history.setdefault(key, []).append((step, float(val)))
        if not self.enabled:
            return
        metrics = self.get_metrics(key, val, step)
        if metrics is None or self.viz is None:
            return
        import numpy as np
        steps, vals = zip(*metrics)
        self._ship(key, np.array(steps, dtype=np.int32),
                   np.array(vals, dtype=np.float32))


def read_log_load(filename: str, last: bool = True) -> Optional[dict]:
    """Re-parse the "Flag Values" JSON block from a log file
    (reference misc.py:193-217)."""
    ret = None
    cur = None
    reading = False
    begin = "Flag Values"
    end = "}"

    with open(filename) as f:
        for line in f:
            if begin in line and not reading:
                cur = ""
                reading = True
                continue
            if reading:
                cur += line.strip()
                if end in line:
                    ret = json.loads(cur)
                    reading = False
                    if not last:
                        return ret
    return ret
