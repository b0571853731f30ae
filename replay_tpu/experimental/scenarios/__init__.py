from replay_tpu.experimental.scenarios.two_stages import TwoStagesScenario

__all__ = ["TwoStagesScenario"]
