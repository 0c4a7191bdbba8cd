"""Full-train-state checkpointing (orbax-backed).

Upgrades the reference's bare ``torch.save(state_dict)``
(utils/utils_3D_embed_full.py:171-175, train3D.py:262-291): the entire
train-state pytree (params, optimiser state, step, schedules) is saved, so
resume continues the optimiser and LR schedule instead of restarting them
(the reference loses both, SURVEY.md section 5.4).
"""

import json
import os
from typing import Any, Optional, Tuple

import jax
import orbax.checkpoint as ocp


def save_checkpoint(path: str, state: Any, aux: Optional[dict] = None) -> None:
    """Save a pytree (and optional small aux metadata dict) to ``path``."""
    path = os.path.abspath(path)
    ckpt = ocp.PyTreeCheckpointer()
    payload = {"state": state}
    if aux is not None:
        payload["aux"] = aux
    ckpt.save(path, payload, force=True)


def restore_checkpoint(path: str, target_state: Any = None) -> dict:
    """Restore; pass ``target_state`` to get proper array types/sharding."""
    path = os.path.abspath(path)
    ckpt = ocp.PyTreeCheckpointer()
    if target_state is not None:
        return ckpt.restore(path, item={"state": target_state, "aux": None})
    return ckpt.restore(path)


def save_train_state(path: str, state: Any, aux: Optional[dict] = None) -> None:
    """Full-train-state artifact: params + optimiser state + step.

    This is what makes resume exact — the reference's ``torch.save`` keeps
    params only (utils_3D_embed_full.py:171-175), so its resumes restart
    the AdamW moments and every schedule. Small host metadata (epoch,
    best_eval_loss, scheduler fields) goes into a JSON sidecar next to the
    orbax tree.
    """
    payload = {"params": jax.device_get(state.params),
               "opt_state": jax.device_get(state.opt_state),
               "step": int(state.step)}
    save_checkpoint(path, payload)
    if aux is not None:
        with open(os.path.abspath(path) + ".aux.json", "w") as f:
            json.dump(aux, f)


def restore_train_state(path: str, state: Any) -> Tuple[Any, dict]:
    """Restore into ``state`` (the template supplies the pytree structure,
    so optax NamedTuple states come back typed). Returns (state, aux)."""
    path = os.path.abspath(path)
    target = {"state": {"params": jax.device_get(state.params),
                        "opt_state": jax.device_get(state.opt_state),
                        "step": int(state.step)}}
    restored = ocp.PyTreeCheckpointer().restore(path, item=target)["state"]
    aux = {}
    aux_path = path + ".aux.json"
    if os.path.exists(aux_path):
        with open(aux_path) as f:
            aux = json.load(f)
    state = state.replace(params=restored["params"],
                          opt_state=restored["opt_state"],
                          step=int(restored["step"]))
    return state, aux


def save_params(path: str, params: Any) -> None:
    """Params-only artifact (the analogue of the reference's temp_model.pt)."""
    save_checkpoint(path, jax.device_get(params))


def restore_params(path: str, target: Any = None) -> Any:
    restored = restore_checkpoint(path, target)
    return restored["state"]
