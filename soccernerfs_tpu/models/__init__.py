"""Model registry: each model module exposes
``Config`` (frozen dataclass), ``init``, ``get_outputs``,
``get_metrics_dict``, ``get_loss_dict`` — a functional re-expression of the
reference's Model interface (ref: models/base_model.py:55-186)."""
