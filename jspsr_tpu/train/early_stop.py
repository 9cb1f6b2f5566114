"""Early stopping + misc training monitors
(reference train/train_utils.py:12-81, utils/utils.py:40-77).

Sign-aware: val_psnr/val_ssim are higher-is-better (the reference treated
every monitor as lower-is-better and even read PSNR for the ssim monitor —
SURVEY 2.2; fixed here, same config surface).
"""

from __future__ import annotations

_HIGHER_BETTER = {"val_psnr", "val_ssim"}


class EarlyStopper:
    def __init__(self, patience=None, monitor: str = "val_loss",
                 min_delta: float = 0.0):
        self.patience = patience
        self.monitor = (monitor or "val_loss").lower()
        self.min_delta = min_delta
        self.best = None
        self.counter = 0

    def metric_from(self, val_loss, eval_result, train_loss=None):
        m = self.monitor
        if m == "val_loss":
            return val_loss
        if m == "trainval_loss":
            return (val_loss + train_loss) if train_loss is not None else val_loss
        if m == "val_psnr":
            return eval_result.get("PSNR")
        if m == "val_ssim":
            return eval_result.get("SSIM")
        if m == "val_rmse":
            return eval_result.get("RMSE")
        raise NotImplementedError(f"Undefined early-stop monitor: {self.monitor}")

    def __call__(self, metric) -> bool:
        """Returns True when training should stop."""
        if self.patience is None or metric is None:
            return False
        better = (
            self.best is None
            or (metric > self.best + self.min_delta
                if self.monitor in _HIGHER_BETTER
                else metric < self.best - self.min_delta)
        )
        if better:
            self.best = metric
            self.counter = 0
        else:
            self.counter += 1
        return self.counter >= self.patience


class AverageMeter:
    """Running average (reference utils/utils.py:40-77).

    Accepts device scalars without forcing a host sync per update (the
    transfer happens when .avg/.val are read)."""

    def __init__(self, name: str = ""):
        self.name = name
        self.reset()

    def reset(self):
        self._val = 0.0
        self._sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1):
        self._val = val
        self._sum = self._sum + val * n
        self.count += n

    @property
    def val(self):
        return float(self._val)

    @property
    def sum(self):
        return float(self._sum)

    @property
    def avg(self):
        return float(self._sum) / max(self.count, 1)


def validate_results(best, current, best_metric: str = "RMSE"):
    """Is ``current`` better than ``best``? (reference
    evaluation/evaluate_utils.py:121-151): RMSE lower, PSNR/SSIM higher."""
    if best is None:
        return True
    key = best_metric
    if key not in current:
        key = next(iter(current))
    if key.upper() in ("PSNR", "SSIM"):
        return current[key] > best[key]
    return current[key] < best[key]


def do_eval(epoch: int, epochs: int, val_interval: int = 1,
            val_start_epoch: int = 1, warmup_epoch: int = 0) -> bool:
    """Eval cadence (reference evaluate_utils.py:211-239): every
    val_interval epochs after val_start_epoch, always the last 3 epochs,
    and the first post-warmup epoch."""
    e = epoch + 1  # 1-based
    if e >= epochs - 2:
        return True
    if warmup_epoch and e == warmup_epoch + 1:
        return True
    if e < val_start_epoch:
        return False
    return e % val_interval == 0
