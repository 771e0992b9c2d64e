"""Metric event storage and writers.

Parity with detectron2/utils/events.py:34-427: ``EventStorage`` is a
context-managed store of scalar histories (with median-smoothing hints) plus
the fork's additions — images, matplotlib figures and histograms
(events.py:234-293) — drained by ``JSONWriter``, ``CommonMetricPrinter`` and
``TensorboardXWriter``.

TPU note: model code never calls ``put_scalar`` from inside jit — jitted steps
return a metrics dict which the trainer feeds into the storage on host
(SURVEY.md section 7 "train-loop side effects").
"""

from __future__ import annotations

import datetime
import json
import logging
import os
import time
from collections import defaultdict
from contextlib import contextmanager

import numpy as np

__all__ = [
    "get_event_storage",
    "has_event_storage",
    "JSONWriter",
    "TensorboardXWriter",
    "CommonMetricPrinter",
    "EventStorage",
    "EventWriter",
]

_CURRENT_STORAGE_STACK = []


def get_event_storage() -> "EventStorage":
    assert len(_CURRENT_STORAGE_STACK), "get_event_storage() must be called inside a 'with EventStorage(...)'"
    return _CURRENT_STORAGE_STACK[-1]


def has_event_storage() -> bool:
    return len(_CURRENT_STORAGE_STACK) > 0


class HistoryBuffer:
    """Track a series of scalar values with windowed median/mean."""

    def __init__(self, max_length: int = 1000000):
        self._max_length = max_length
        self._data = []  # (value, iteration)
        self._count = 0
        self._global_avg = 0.0

    def update(self, value: float, iteration: float | None = None):
        if iteration is None:
            iteration = self._count
        if len(self._data) == self._max_length:
            self._data.pop(0)
        self._data.append((value, iteration))
        self._count += 1
        self._global_avg += (value - self._global_avg) / self._count

    def latest(self):
        return self._data[-1][0]

    def median(self, window_size: int):
        return float(np.median([x[0] for x in self._data[-window_size:]]))

    def avg(self, window_size: int):
        return float(np.mean([x[0] for x in self._data[-window_size:]]))

    def global_avg(self):
        return self._global_avg

    def values(self):
        return list(self._data)


class EventStorage:
    """The user-facing class that stores per-iteration scalars/images/figs."""

    def __init__(self, start_iter: int = 0):
        self._history = defaultdict(HistoryBuffer)
        self._smoothing_hints = {}
        self._latest_scalars = {}
        self._iter = start_iter
        self._current_prefix = ""
        self._vis_images = []  # (tag, HWC-or-CHW uint8 array, iter)
        self._vis_figures = []  # (tag, matplotlib figure, iter)
        self._histograms = []  # (tag, np array of raw values, iter)

    # -- scalars ------------------------------------------------------------
    def put_scalar(self, name, value, smoothing_hint=True):
        name = self._current_prefix + name
        value = float(value)
        self._history[name].update(value, self._iter)
        self._latest_scalars[name] = (value, self._iter)
        existing_hint = self._smoothing_hints.get(name)
        if existing_hint is not None:
            assert existing_hint == smoothing_hint, "Scalar {} was put with inconsistent smoothing_hint".format(name)
        else:
            self._smoothing_hints[name] = smoothing_hint

    def put_scalars(self, *, smoothing_hint=True, **kwargs):
        for k, v in kwargs.items():
            self.put_scalar(k, v, smoothing_hint=smoothing_hint)

    # -- rich media (fork additions, reference events.py:234-293) -----------
    def put_image(self, img_name, img_tensor):
        self._vis_images.append((img_name, np.asarray(img_tensor), self._iter))

    def put_figure(self, fig_name, figure):
        self._vis_figures.append((fig_name, figure, self._iter))

    def put_histogram(self, hist_name, values, bins=1000):
        self._histograms.append((hist_name, np.asarray(values).reshape(-1), self._iter, bins))

    def clear_images(self):
        self._vis_images = []

    def clear_figures(self):
        self._vis_figures = []

    def clear_histograms(self):
        self._histograms = []

    # -- accessors ----------------------------------------------------------
    def history(self, name) -> HistoryBuffer:
        ret = self._history.get(name, None)
        if ret is None:
            raise KeyError("No history metric available for {}!".format(name))
        return ret

    def histories(self):
        return self._history

    def latest(self):
        return self._latest_scalars

    def latest_with_smoothing_hint(self, window_size=20):
        result = {}
        for k, (v, itr) in self._latest_scalars.items():
            result[k] = (self._history[k].median(window_size) if self._smoothing_hints[k] else v, itr)
        return result

    def smoothing_hints(self):
        return self._smoothing_hints

    def step(self):
        self._iter += 1

    @property
    def iter(self):
        return self._iter

    @iter.setter
    def iter(self, val):
        self._iter = int(val)

    @property
    def iteration(self):  # backward compatible alias
        return self._iter

    def __enter__(self):
        _CURRENT_STORAGE_STACK.append(self)
        return self

    def __exit__(self, exc_type, exc_val, exc_tb):
        assert _CURRENT_STORAGE_STACK[-1] == self
        _CURRENT_STORAGE_STACK.pop()

    @contextmanager
    def name_scope(self, name):
        old_prefix = self._current_prefix
        self._current_prefix = name.rstrip("/") + "/"
        yield
        self._current_prefix = old_prefix


class EventWriter:
    def write(self):
        raise NotImplementedError

    def close(self):
        pass


class JSONWriter(EventWriter):
    """Append latest (smoothed) scalars as JSON lines to a file."""

    def __init__(self, json_file, window_size=20):
        os.makedirs(os.path.dirname(os.path.abspath(json_file)), exist_ok=True)
        self._file_handle = open(json_file, "a")
        self._window_size = window_size
        self._last_write = -1

    def write(self):
        storage = get_event_storage()
        to_save = defaultdict(dict)
        for k, (v, itr) in storage.latest_with_smoothing_hint(self._window_size).items():
            if itr <= self._last_write:
                continue
            to_save[itr][k] = v
        if len(to_save):
            self._last_write = max(to_save.keys())
        for itr, scalars_per_iter in sorted(to_save.items()):
            scalars_per_iter["iteration"] = itr
            self._file_handle.write(json.dumps(scalars_per_iter, sort_keys=True) + "\n")
        self._file_handle.flush()
        try:
            os.fsync(self._file_handle.fileno())
        except OSError:
            pass

    def close(self):
        self._file_handle.close()


class TensorboardXWriter(EventWriter):
    """Write scalars, images, figures and histograms to tensorboard."""

    def __init__(self, log_dir: str, window_size: int = 20, **kwargs):
        self._window_size = window_size
        self._writer = None
        self._last_write = -1
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._writer = SummaryWriter(log_dir, **kwargs)
        except Exception:  # tensorboard optional
            logging.getLogger(__name__).warning("tensorboard unavailable; TensorboardXWriter is a no-op")

    def write(self):
        if self._writer is None:
            return
        storage = get_event_storage()
        new_last = self._last_write
        for k, (v, itr) in storage.latest_with_smoothing_hint(self._window_size).items():
            if itr > self._last_write:
                self._writer.add_scalar(k, v, itr)
                new_last = max(new_last, itr)
        self._last_write = new_last
        for img_name, img, itr in storage._vis_images:
            dataformats = "CHW" if img.ndim == 3 and img.shape[0] in (1, 3) else "HWC"
            self._writer.add_image(img_name, img, itr, dataformats=dataformats)
        storage.clear_images()
        for fig_name, fig, itr in storage._vis_figures:
            self._writer.add_figure(fig_name, fig, itr)
        storage.clear_figures()
        for item in storage._histograms:
            hist_name, values, itr = item[0], item[1], item[2]
            self._writer.add_histogram(hist_name, values, itr)
        storage.clear_histograms()

    def close(self):
        if self._writer is not None:
            self._writer.close()


class CommonMetricPrinter(EventWriter):
    """Console printer: eta, iteration, losses, lr, data/step time."""

    def __init__(self, max_iter: int):
        self.logger = logging.getLogger(__name__)
        self._max_iter = max_iter
        self._last_write = None

    def write(self):
        storage = get_event_storage()
        iteration = storage.iter

        data_time, time_str, eta_string = None, "", "N/A"
        try:
            data_time = storage.history("data_time").avg(20)
        except KeyError:
            pass
        try:
            iter_time = storage.history("time").global_avg()
            eta_seconds = iter_time * (self._max_iter - iteration)
            eta_string = str(datetime.timedelta(seconds=int(eta_seconds)))
            time_str = "time: {:.4f}".format(iter_time)
        except KeyError:
            iter_time = None
            if self._last_write is not None:
                estimate = (time.perf_counter() - self._last_write[1]) / max(
                    iteration - self._last_write[0], 1
                )
                eta_string = str(datetime.timedelta(seconds=int(estimate * (self._max_iter - iteration))))
            self._last_write = (iteration, time.perf_counter())

        try:
            lr = "{:.6f}".format(storage.history("lr").latest())
        except KeyError:
            lr = "N/A"

        losses = [
            "{}: {:.4g}".format(k, v.median(20))
            for k, v in storage.histories().items()
            if "loss" in k
        ]
        self.logger.info(
            "eta: {eta}  iter: {iter}  {losses}  {time}  {data_time}  lr: {lr}".format(
                eta=eta_string,
                iter=iteration,
                losses="  ".join(losses),
                time=time_str,
                data_time="data_time: {:.4f}".format(data_time) if data_time is not None else "",
                lr=lr,
            )
        )
