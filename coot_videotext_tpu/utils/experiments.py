"""
Experiment file organization: path scheme, checkpoint enumeration, best/last
epoch discovery.

Parity with reference nntrainer/experiment_organization.py:21-232. One
difference: model/optimizer weights are stored as orbax checkpoint
DIRECTORIES (`models/model_<ep>` / `models/optimizer_<ep>`) instead of torch
`.pth` files; the json sidecars (trainerstate, metrics) keep the reference's
exact names and schema, so `find_best_epoch` (reading infos_val_is_good from
the last trainerstate, reference :79-102) works unchanged on either layout.
"""

from __future__ import annotations

import glob
import shutil
from pathlib import Path
from typing import List, Union

import numpy as np

from coot_videotext_tpu.config.base import BaseTrainerState
from coot_videotext_tpu.utils.general import TrainerPathConst


class ExperimentFilesHandler:
    """
    Handles file locations for one experiment run
    (experiments/<type>/<group>/<name>_<run>/...).
    """

    def __init__(self, model_type: str, exp_group: str, exp_name: str,
                 run_name: str, *,
                 log_dir: str = TrainerPathConst.DIR_EXPERIMENTS) -> None:
        self.exp_group = exp_group
        self.exp_name = exp_name
        self.run_name = run_name
        self.model_type = model_type
        self.path_base: Path = (Path(log_dir) / self.model_type /
                                self.exp_group /
                                f"{self.exp_name}_{self.run_name}")
        self.path_logs = self.path_base / TrainerPathConst.DIR_LOGS
        self.path_models = self.path_base / TrainerPathConst.DIR_MODELS
        self.path_metrics = self.path_base / TrainerPathConst.DIR_METRICS
        self.path_tensorb = self.path_base / TrainerPathConst.DIR_TB
        self.path_embeddings = (self.path_base /
                                TrainerPathConst.DIR_EMBEDDINGS)

    def setup_dirs(self, *, reset: bool = False) -> None:
        if reset:
            shutil.rmtree(self.path_base, ignore_errors=True)
        for path in (self.path_logs, self.path_models, self.path_metrics,
                     self.path_tensorb):
            path.mkdir(parents=True, exist_ok=True)

    def get_existing_checkpoints(self) -> List[int]:
        """Epoch numbers with a saved trainerstate (reference :64)."""
        files = glob.glob(str(self.get_trainerstate_file("*")))
        prefix = TrainerPathConst.FILE_PREFIX_TRAINERSTATE
        return sorted(int(f.split(f"{prefix}_")[-1].split(".json")[0])
                      for f in files)

    def find_best_epoch(self) -> int:
        """
        Best epoch from the last trainerstate's infos_val_is_good flags
        (reference :79-102). -1 if no checkpoints.
        """
        ep_nums = self.get_existing_checkpoints()
        if not ep_nums:
            return -1
        state = BaseTrainerState.create_from_file(
            self.get_trainerstate_file(ep_nums[-1]))
        if not state.infos_val_epochs:
            return ep_nums[-1]
        where_res = np.where(state.infos_val_is_good)[0]
        best_idx = where_res[-1]
        return state.infos_val_epochs[best_idx]

    def find_last_epoch(self) -> int:
        ep_nums = self.get_existing_checkpoints()
        return ep_nums[-1] if ep_nums else -1

    def get_existing_metrics(self) -> List[int]:
        files = glob.glob(str(self.get_metrics_epoch_file("*")))
        prefix = TrainerPathConst.FILE_PREFIX_METRICS_EPOCH
        return sorted(int(f.split(f"{prefix}_")[-1].split(".json")[0])
                      for f in files)

    # ---------- File definitions ----------

    def get_models_file(self, epoch: Union[int, str]) -> Path:
        """orbax checkpoint directory for the model params."""
        return self.path_models / \
            f"{TrainerPathConst.FILE_PREFIX_MODEL}_{epoch}"

    def get_models_file_ema(self, epoch: Union[int, str]) -> Path:
        return self.path_models / \
            f"{TrainerPathConst.FILE_PREFIX_MODELEMA}_{epoch}"

    def get_optimizer_file(self, epoch: Union[int, str]) -> Path:
        return self.path_models / \
            f"{TrainerPathConst.FILE_PREFIX_OPTIMIZER}_{epoch}"

    def get_scheduler_file(self, epoch: Union[int, str]) -> Path:
        """json sidecar for host-side LR-scheduler state (the reference
        stores it inside optimizer_<ep>.pth; here the optimizer file is an
        orbax array dir, so scheduler state gets its own json)."""
        return self.path_models / f"scheduler_{epoch}.json"

    def get_trainerstate_file(self, epoch: Union[int, str]) -> Path:
        return self.path_models / \
            f"{TrainerPathConst.FILE_PREFIX_TRAINERSTATE}_{epoch}.json"

    def get_metrics_step_file(self, epoch: Union[int, str]) -> Path:
        return self.path_metrics / \
            f"{TrainerPathConst.FILE_PREFIX_METRICS_STEP}_{epoch}.json"

    def get_metrics_epoch_file(self, epoch: Union[int, str]) -> Path:
        return self.path_metrics / \
            f"{TrainerPathConst.FILE_PREFIX_METRICS_EPOCH}_{epoch}.json"
