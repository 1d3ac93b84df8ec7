"""Controller registries, mirroring the reference's name->class maps
(utils.py:32-75).

* :func:`get_controller` — closed-loop (RTI) controllers, the analogue of
  `get_controller` (utils.py:64-75).
* :func:`get_guess_controller` — initializer solvers for guess generation;
  safe variants all map to the hard-terminal controller run in full-SQP
  mode, exactly like `get_ocp_acados` (utils.py:46-62).
* :func:`get_ocp` — the reference's IPOPT family (utils.py:32-44) maps to
  the same classes in full-SQP mode (our engine subsumes both reference
  solver stacks; SURVEY.md §2.2).
"""

from __future__ import annotations

from ..models.manipulator import ManipulatorModel
from .base import (HTWAController, MPCController, ParallelController,
                   RealReceding, RecedingController, SafeBackupController,
                   SafeSetEverywhere, STController, STWAController,
                   TerminalZeroVelocity)

CONTROLLERS = {
    "naive": MPCController,
    "zerovel": TerminalZeroVelocity,
    "st": STController,
    "stwa": STWAController,
    "htwa": HTWAController,
    "receding": RecedingController,
    "real_receding": RealReceding,
    "parallel": ParallelController,
    "constraint_everywhere": SafeSetEverywhere,
    "backup": SafeBackupController,
}

# guess generation maps every safe variant to the hard-terminal solver
# (utils.py:46-62)
GUESS_CONTROLLERS = {
    "naive": MPCController,
    "zerovel": TerminalZeroVelocity,
    "st": HTWAController,
    "htwa": HTWAController,
    "receding": HTWAController,
    "real_receding": HTWAController,
    "parallel": HTWAController,
    "st_analytic": HTWAController,
    "htwa_analytic": HTWAController,
    "constraint_everywhere": HTWAController,
    "receding_analytic": HTWAController,
    "parallel_analytic": HTWAController,
}

# the reference's IPOPT OCP family (utils.py:32-44): same algorithms on a
# second backend; our full-SQP mode plays that role
OCPS = {
    "naive": MPCController,
    "zerovel": TerminalZeroVelocity,
    "st": STController,
    "htwa": HTWAController,
    "receding": RecedingController,
    "real_receding": HTWAController,
    "parallel": HTWAController,
    "real": HTWAController,
}


def _make(table, name, model: ManipulatorModel, **kw):
    if name not in table:
        raise ValueError(f"Controller {name!r} not available "
                         f"(have: {sorted(table)})")
    return table[name](model, **kw)


def get_controller(name: str, model: ManipulatorModel, **kw) -> MPCController:
    return _make(CONTROLLERS, name, model, **kw)


def get_guess_controller(name: str, model: ManipulatorModel,
                         **kw) -> MPCController:
    kw.setdefault("rti_iters", model.cfg.nlp_max_iter)
    return _make(GUESS_CONTROLLERS, name, model, **kw)


def get_ocp(name: str, model: ManipulatorModel, **kw) -> MPCController:
    kw.setdefault("rti_iters", model.cfg.nlp_max_iter)
    return _make(OCPS, name, model, **kw)
