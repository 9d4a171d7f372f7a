"""Engine package — everything resolves lazily so each entry point pays
only for the stack it uses: train_state/trainer pull in optax + losses +
models, evaluator pulls in metrics + transforms, and the artifact-only
serving path (export.FeatureExtractor.from_exported) needs none of them.
"""

__all__ = [
    "TrainState", "create_train_state", "make_train_step",
    "Evaluator", "make_eval_forward",
    "FeatureExtractor", "export_eval_forward", "save_exported",
    "load_exported",
]

_HOMES = {
    "TrainState": "train_state",
    "create_train_state": "train_state",
    "make_train_step": "trainer",
    "Evaluator": "evaluator",
    "make_eval_forward": "evaluator",
    "FeatureExtractor": "export",
    "export_eval_forward": "export",
    "save_exported": "export",
    "load_exported": "export",
}


def __getattr__(name):
    home = _HOMES.get(name)
    if home is None:
        raise AttributeError(name)
    import importlib

    return getattr(importlib.import_module(f"agrl_tpu.engine.{home}"), name)
