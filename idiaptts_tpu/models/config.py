"""Model config base.

Capability parity with ``models/ModelConfig.py`` (:1-55): named inputs
and outputs, input merge types, ``create_model``.  Configs are plain
picklable objects serialised as JSON into checkpoints
(``get_config_as_json`` role, RNNDyn.py:374-375).
"""

import json


def _tuple(value):
    if value is None:
        return None
    if isinstance(value, (tuple, list)):
        return tuple(value)
    return (value,)


class ModelConfig:
    """Base class for model configs."""

    MERGE_CAT = "cat"
    MERGE_ADD = "add"
    MERGE_MEAN = "mean"
    MERGE_MUL = "mul"
    MERGE_ATTENTION = "attention"
    MERGE_LIST = "list"

    def __init__(self, input_names=None, output_names=None,
                 input_merge_type=MERGE_CAT, batch_first=True, name=None,
                 teacher_forcing_input_names=None):
        self.input_names = _tuple(input_names)
        self.output_names = _tuple(output_names)
        self.input_merge_type = input_merge_type
        self.batch_first = batch_first
        self.name = name
        # Inputs only available during training (filtered at inference;
        # NamedForwardModule.py:61-77 role).
        self.teacher_forcing_input_names = _tuple(
            teacher_forcing_input_names) or ()

    def create_model(self):
        raise NotImplementedError

    def all_input_names(self):
        """Every name this module reads from the data dict — configs
        with side inputs beyond ``input_names`` (e.g. the VTLN layer's
        ``alpha_input_names``) override this so generic machinery
        (forward(input_only=True) reader filtering) keeps their
        readers."""
        return tuple(self.input_names or ())

    # -- (de)serialisation ------------------------------------------------
    def to_json(self):
        return json.dumps(_encode(self), indent=2)

    @staticmethod
    def from_json(json_str):
        obj = _decode(json.loads(json_str))
        # JSON turns tuples into lists; restore tuples for name fields.
        for key in ("input_names", "output_names",
                    "teacher_forcing_input_names"):
            if getattr(obj, key, None) is not None:
                setattr(obj, key, tuple(getattr(obj, key)))
        return obj


def _encode(value):
    """Recursively encode arbitrary config objects as JSON with class
    markers (the jsonpickle role, ModularModelHandlerPyTorch.py:96-99)."""
    if isinstance(value, (str, int, float, bool, type(None))):
        return value
    if isinstance(value, (list, tuple)):
        return [_encode(v) for v in value]
    if isinstance(value, set):
        return {"__set__": [_encode(v) for v in sorted(value)]}
    if isinstance(value, dict):
        return {str(k): _encode(v) for k, v in value.items()}
    if callable(value) and not hasattr(value, "__dict__"):
        return {"__repr__": repr(value)}
    if hasattr(value, "__dict__"):
        # __qualname__, not __name__: nested classes like
        # WaveNetWrapper.Config must round-trip through JSON.
        state = {"__class__": type(value).__module__ + ":"
                 + type(value).__qualname__}
        for key, attr in value.__dict__.items():
            if callable(attr) and not hasattr(attr, "__dict__"):
                continue
            state[key] = _encode(attr)
        return state
    return {"__repr__": repr(value)}


def _decode(value):
    import importlib
    if isinstance(value, list):
        return [_decode(v) for v in value]
    if isinstance(value, dict):
        if "__set__" in value:
            return set(_decode(value["__set__"]))
        if "__repr__" in value:
            return None
        if "__class__" in value:
            state = dict(value)
            cls_path = state.pop("__class__")
            if ":" in cls_path:                # module:Qual.Name form
                module_name, qualname = cls_path.split(":", 1)
            else:                              # legacy module.Name form
                module_name, qualname = cls_path.rsplit(".", 1)
            cls = importlib.import_module(module_name)
            for part in qualname.split("."):
                cls = getattr(cls, part)
            obj = cls.__new__(cls)
            for key, attr in state.items():
                setattr(obj, key, _decode(attr))
            return obj
        return {k: _decode(v) for k, v in value.items()}
    return value
