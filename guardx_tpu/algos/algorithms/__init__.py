"""Per-algorithm update rules. Each module defines one Algorithm subclass;
REGISTRY maps CLI names to classes (reference: one safe_rl_libX/<algo>/ dir
per algorithm — here each is a thin module over the shared TR core)."""

from guardx_tpu.algos.algorithms.pg_family import PPO, A2C, APO
from guardx_tpu.algos.algorithms.tr_family import (
    TRPO, TRPOLag, CPO, PCPO, PDO, TRPOIPO, TRPOFAC,
)
from guardx_tpu.algos.algorithms.scpo import SCPO
from guardx_tpu.algos.algorithms.qc_family import USL, SafetyLayer, LPG
from guardx_tpu.algos.algorithms.oe_family import ESPO, AlphaPPO, VMPO, PAPO
from guardx_tpu.algos.algorithms.issa_family import ISSA, UAISSA
from guardx_tpu.algos.algorithms.amp import AMP, HRL

REGISTRY = {
    cls.name: cls
    for cls in [
        PPO, A2C, APO, TRPO, TRPOLag, CPO, PCPO, PDO, TRPOIPO, TRPOFAC,
        SCPO, USL, SafetyLayer, LPG,
        ESPO, AlphaPPO, VMPO, PAPO,  # one-episode-only family
        ISSA, UAISSA,  # legacy-layer safe-control family
        AMP, HRL,  # rl_games learning suite counterparts (IsaacGymEnvs)
    ]
}

__all__ = ["REGISTRY"]
