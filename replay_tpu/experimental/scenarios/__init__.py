from replay_tpu.experimental.scenarios.obp_wrapper import (
    OBPOfflinePolicyLearner,
    estimate_policy_value,
    split_bandit_feedback,
)
from replay_tpu.experimental.scenarios.two_stages import TwoStagesScenario

__all__ = [
    "OBPOfflinePolicyLearner",
    "TwoStagesScenario",
    "estimate_policy_value",
    "split_bandit_feedback",
]
