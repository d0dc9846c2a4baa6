"""Training observability: windowed meters + per-iteration progress printing.

Parity target: reference utils.py:9-138 (SmoothedValue window 20 with
median/avg/global_avg/max/value accessors; MetricLogger.log_every printing
eta, meters, per-iter time, data-loading time and device memory), re-homed
for JAX: memory comes from jax device memory stats instead of
torch.cuda.max_memory_allocated.
"""

from __future__ import annotations

import datetime
import time
from collections import defaultdict, deque
from typing import Dict, Iterable, Optional

import jax
import numpy as np


class SmoothedValue:
    def __init__(self, window_size: int = 20, fmt: str = "{median:.4f} ({global_avg:.4f})"):
        self.deque: deque = deque(maxlen=window_size)
        self.total = 0.0
        self.count = 0
        self.fmt = fmt

    def update(self, value, n: int = 1):
        value = float(value)
        self.deque.append(value)
        self.count += n
        self.total += value * n

    @property
    def median(self) -> float:
        return float(np.median(self.deque)) if self.deque else 0.0

    @property
    def avg(self) -> float:
        return float(np.mean(self.deque)) if self.deque else 0.0

    @property
    def global_avg(self) -> float:
        return self.total / max(self.count, 1)

    @property
    def max(self) -> float:
        return max(self.deque) if self.deque else 0.0

    @property
    def value(self) -> float:
        return self.deque[-1] if self.deque else 0.0

    def __str__(self) -> str:
        return self.fmt.format(
            median=self.median, avg=self.avg, global_avg=self.global_avg,
            max=self.max, value=self.value,
        )


def _device_memory_mb() -> Optional[float]:
    try:
        stats = jax.local_devices()[0].memory_stats()
        if stats and "bytes_in_use" in stats:
            return stats["bytes_in_use"] / (1024.0 * 1024.0)
    except Exception:
        pass
    return None


class TensorBoardSink:
    """Per-epoch scalar dump to {checkpoint_dir}/runs (reference
    train.py:176-177,191-262); no-ops when tensorboardX is unavailable."""

    def __init__(self, log_dir: str):
        try:
            from tensorboardX import SummaryWriter

            self._writer = SummaryWriter(log_dir)
        except Exception:
            self._writer = None

    def scalars(self, stats: Dict[str, float], step: int):
        if self._writer is None:
            return
        for k, v in stats.items():
            if isinstance(v, (int, float)):
                self._writer.add_scalar(k, v, step)
        self._writer.flush()

    def close(self):
        if self._writer is not None:
            self._writer.close()


class MetricLogger:
    def __init__(self, delimiter: str = "  "):
        self.meters: Dict[str, SmoothedValue] = defaultdict(SmoothedValue)
        self.delimiter = delimiter

    def update(self, **kwargs):
        for k, v in kwargs.items():
            self.meters[k].update(float(v))

    def __getattr__(self, attr):
        if attr in self.meters:
            return self.meters[attr]
        raise AttributeError(attr)

    def __str__(self):
        return self.delimiter.join(
            f"{name}: {meter}" for name, meter in self.meters.items()
        )

    def global_averages(self) -> Dict[str, float]:
        """Epoch summary (reference's `{k: meter.global_avg}` dict)."""
        return {k: m.global_avg for k, m in self.meters.items()}

    def log_every(self, iterable: Iterable, print_freq: int, header: str = "",
                  pre_print=None):
        """`pre_print` (optional callable) runs just before each progress
        print — the hook where deferred device->host metric syncs flush, so
        the step loop itself never blocks on a transfer (reference syncs per
        meter update, utils.py:63; we sync once per print window)."""
        i = 0
        start = time.time()
        end = time.time()
        iter_time = SmoothedValue(fmt="{avg:.4f}")
        data_time = SmoothedValue(fmt="{avg:.4f}")
        total = len(iterable) if hasattr(iterable, "__len__") else None
        space = len(str(total)) if total else 6

        for obj in iterable:
            data_time.update(time.time() - end)
            yield obj
            iter_time.update(time.time() - end)
            if i % print_freq == 0:
                if pre_print is not None:
                    pre_print()
                if total:
                    eta_seconds = iter_time.global_avg * (total - i)
                    eta = str(datetime.timedelta(seconds=int(eta_seconds)))
                else:
                    eta = "?"
                mem = _device_memory_mb()
                mem_str = f"  mem: {mem:.0f}MB" if mem is not None else ""
                count = f"[{i:{space}d}/{total}]" if total else f"[{i}]"
                print(
                    f"{header} {count}  eta: {eta}  {self}  "
                    f"time: {iter_time}  data: {data_time}{mem_str}",
                    flush=True,
                )
            i += 1
            end = time.time()
        elapsed = str(datetime.timedelta(seconds=int(time.time() - start)))
        print(f"{header} Total time: {elapsed}", flush=True)
