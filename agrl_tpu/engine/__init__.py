from agrl_tpu.engine.train_state import TrainState, create_train_state
from agrl_tpu.engine.trainer import make_train_step

__all__ = ["TrainState", "create_train_state", "make_train_step"]


def __getattr__(name):
    # lazy: evaluator/export pull in the metrics + transforms stacks
    if name in ("Evaluator", "make_eval_forward"):
        from agrl_tpu.engine import evaluator

        return getattr(evaluator, name)
    if name in ("FeatureExtractor", "export_eval_forward", "save_exported",
                "load_exported"):
        from agrl_tpu.engine import export

        return getattr(export, name)
    raise AttributeError(name)
