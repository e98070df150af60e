"""Experiment metrics logging (inventory row 55).

The reference carries wandb keys in every trainer config
(`configs/self_forcing_dmd.yaml` wandb_host/key/entity/...) but its
released code never calls wandb — observability is print statements.
This module completes that surface TPU-side without external services:

  * `MetricsLogger` appends one JSON object per step to
    `<dir>/<run>/metrics.jsonl` (crash-safe append, host-side only — no
    device sync beyond the scalars the caller already pulled);
  * `config.json` records the run config once (the wandb_* keys land
    here, so a later wandb/tensorboard import has everything);
  * if the `wandb` package exists AND the config carries wandb keys, it
    mirrors to wandb transparently (absent in this image — gated).

Used by train.py; serving logs request latencies through the same API.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional


class MetricsLogger:
    def __init__(self, log_dir: str = "runs", run_name: Optional[str] = None,
                 config: Optional[Dict[str, Any]] = None):
        run_name = run_name or time.strftime("run-%Y%m%d-%H%M%S")
        self.dir = os.path.join(log_dir, run_name)
        os.makedirs(self.dir, exist_ok=True)
        self.path = os.path.join(self.dir, "metrics.jsonl")
        self._t0 = time.time()
        self._wandb = None
        if config is not None:
            with open(os.path.join(self.dir, "config.json"), "w",
                      encoding="utf-8") as f:
                json.dump(config, f, indent=2, default=str)
            if config.get("wandb_key"):
                try:  # pragma: no cover - wandb absent in this image
                    import wandb
                    self._wandb = wandb.init(
                        project=config.get("wandb_project", "mmpl_tpu"),
                        entity=config.get("wandb_entity"),
                        name=run_name, config=config)
                except Exception:
                    self._wandb = None

    def log(self, step: int, **scalars: float) -> None:
        rec = {"step": int(step),
               "time": round(time.time() - self._t0, 3)}
        for k, v in scalars.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                rec[k] = v
        with open(self.path, "a", encoding="utf-8") as f:
            f.write(json.dumps(rec) + "\n")
        if self._wandb is not None:  # pragma: no cover
            self._wandb.log(scalars, step=step)

    def read(self):
        """All records logged so far (for tests / resumption tooling)."""
        if not os.path.exists(self.path):
            return []
        with open(self.path, encoding="utf-8") as f:
            return [json.loads(line) for line in f if line.strip()]
