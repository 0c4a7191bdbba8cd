"""Training-equivalence evidence: per-step loss parity vs the torch reference.

BASELINE.md's quality target is Dice parity of the TRAINING procedure, not
just the forward. This script drives both stacks through an identical
N-step binary-training run and records the loss trajectories:

* identical init (torch weights converted via compat.torch_import);
* identical synthetic data stream (seeded blobs, 64x64x16 patches);
* the reference's exact deep-supervision recipe — per-level criterion
  schedule (train3D.py:139-155), epoch-0 dynamic weights
  (train3D.py:122-137, utils_3D_embed_full.py:16-19, warmup_step=10),
  label pyramid (utils_3D_embed_full.py:64,73-76), AdamW lr 1e-4
  (train3D.py:193);
* dropout=0 on both sides so the runs are deterministic;
* f32 everywhere (precision=highest on our side).

The torch loop below re-implements only the loss/step math of
utils_3D_embed_full.train_on_epoch:56-91 (that module imports monai at the
top level, which this image does not ship); every line cites its source.

Writes experiments/parity_training.json and prints a summary row for
BASELINE.md.

Run: python experiments/parity_training.py  (CPU, ~10 min)
"""

import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, "/root/repo")

import numpy as np

STEPS = 40
PATCH = (64, 64, 16)
CONFIG = dict(
    num_layers=(8, 16, 32, 32, 64),
    roi_size_list=(16, 12, 8, 6, 4),
    is_roi_list=(False, True, True, True, True),
    dim_input=1, dim_output=2,
)
LR = float(os.environ.get("PARITY_LR", "1e-4"))

# Epoch-0 dynamic weights: min(initial + default*e^0, final)
# (train3D.py:91-99 defaults; get_weight utils_3D_embed_full.py:16-19 with
# t = max(0 - warmup_step, 0) = 0).
WEIGHT_LIST = [0.05, 0.05, 0.1, 0.1, 1.0]
INITIAL = [0.1, 0.2, 0.3, 0.4, 1.0]
FINAL = [2.0, 1.5, 1.0, 1.0, 1.0]
DYNAMIC_WEIGHT = [min(i + w, f) for w, f, i in zip(WEIGHT_LIST, FINAL, INITIAL)]

CRITERION_SCHEDULE = (
    # get_criterion_list, train3D.py:139-155 (5 levels, coarse -> fine)
    ["CrossEntroLoss", "BalanceDiceLoss"],
    ["CrossEntroLoss", "BalanceDiceLoss"],
    ["CrossEntroLoss", "BalanceDiceLoss"],
    ["CrossEntroLoss", "DiceClassLoss"],
    ["CrossEntroLoss", "DiceClassLoss"],
)


def make_data():
    """Seeded blob volumes: image = noise + bright sphere, label = sphere."""
    rng = np.random.default_rng(1234)
    images, labels = [], []
    h, w, d = PATCH
    yy, xx, zz = np.meshgrid(np.arange(h), np.arange(w), np.arange(d),
                             indexing="ij")
    for _ in range(STEPS + 4):
        cy, cx, cz = rng.uniform(16, 48), rng.uniform(16, 48), rng.uniform(4, 12)
        r = rng.uniform(6, 14)
        blob = (((yy - cy) ** 2 + (xx - cx) ** 2 +
                 ((zz - cz) * 2.0) ** 2) < r * r)
        img = rng.standard_normal((h, w, d)) * 0.3 + blob * 1.5
        images.append(img.astype(np.float32))
        labels.append(blob.astype(np.int64))
    return np.stack(images), np.stack(labels)


def run_torch(images, labels):
    import torch
    import torch.nn.functional as F

    sys.path.insert(0, "/root/reference")
    try:
        from model.trans_3DUnet import MaskTransUnet as TorchModel
        from loss.criterions import get_criterions
    finally:
        sys.path.pop(0)

    torch.manual_seed(0)
    model = TorchModel(num_layers=list(CONFIG["num_layers"]),
                       roi_size_list=list(CONFIG["roi_size_list"]),
                       is_roi_list=list(CONFIG["is_roi_list"]),
                       dim_input=1, dim_output=2, kernel_size=3, dropout=0.0)
    model.train()
    state0 = {k: v.detach().numpy().copy() for k, v in model.state_dict().items()}
    criterions = [get_criterions(names) for names in CRITERION_SCHEDULE]
    opt = torch.optim.AdamW(model.parameters(), lr=LR)  # train3D.py:193

    losses = []
    for t in range(STEPS):
        # (N, C, H, W, D) layout; labels carry a channel dim as in the
        # reference datasets (CrossEntroLoss docstring: target (N,1,H,W,D));
        # utils_3D_embed_full.py:46-64
        img = torch.from_numpy(images[t][None, None])
        msk = torch.from_numpy(labels[t][None, None])
        temp_masks = F.max_pool3d(msk.float(), kernel_size=(2, 2, 1),
                                  stride=(2, 2, 1))
        predict, roi_mask = model(img)
        loss_list = []
        for k in range(len(DYNAMIC_WEIGHT)):  # utils_3D_embed_full.py:66-82
            if k == 0:
                temp_loss = [l(predict, msk.long())
                             for l in criterions[-1].values()]
            else:
                temp_loss = [l(roi_mask[-k], temp_masks.long())
                             for l in criterions[-k - 1].values()]
                with torch.no_grad():
                    kern = 2 if k % 2 == 0 else (2, 2, 1)
                    temp_masks = F.max_pool3d(temp_masks, kernel_size=kern,
                                              stride=kern)
            loss_list.append(temp_loss)
        total = sum(sum(l) * w for l, w in zip(loss_list, DYNAMIC_WEIGHT))
        losses.append(float(total.detach()))
        opt.zero_grad()
        total.backward()
        opt.step()
    return state0, losses


def run_jax(images, labels, torch_state0):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")

    from lintransunet_tpu.compat import convert_state_dict
    from lintransunet_tpu.engine import create_train_state, make_train_step
    from lintransunet_tpu.losses import get_criterions
    from lintransunet_tpu.models import MaskTransUnet

    model = MaskTransUnet(**CONFIG, dropout=0.0)
    x0 = jnp.zeros((1,) + PATCH + (1,), jnp.float32)
    state = create_train_state(model, jax.random.PRNGKey(0), x0,
                               learning_rate=LR, step_times=1)
    params = convert_state_dict(torch_state0, state.params)
    state = state.replace(params=params)

    criterions = [get_criterions(names) for names in CRITERION_SCHEDULE]
    step = make_train_step(model, criterions)
    dw = jnp.asarray(DYNAMIC_WEIGHT, jnp.float32)

    losses = []
    rng = jax.random.PRNGKey(7)  # dropout rng; dropout=0 so inert
    for t in range(STEPS):
        img = jnp.asarray(images[t][..., None][None])     # (1, H, W, D, 1)
        msk = jnp.asarray(labels[t][None])                # (1, H, W, D)
        state, loss, _ = step(state, img, msk, dw, rng)
        losses.append(float(loss))
    return losses


def main():
    images, labels = make_data()
    print("running torch reference...", flush=True)
    state0, torch_losses = run_torch(images, labels)
    print("running lintransunet_tpu...", flush=True)
    jax_losses = run_jax(images, labels, state0)

    rel = [abs(a - b) / max(abs(a), 1e-8)
           for a, b in zip(torch_losses, jax_losses)]
    out = {
        "steps": STEPS, "lr": LR,
        "patch": PATCH,
        "torch_losses": torch_losses,
        "jax_losses": jax_losses,
        "max_rel_diff": max(rel),
        "final_rel_diff": rel[-1],
    }
    path = os.path.join(os.path.dirname(__file__), f"parity_training_lr{LR:g}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"step  0: torch {torch_losses[0]:.6f}  jax {jax_losses[0]:.6f}")
    print(f"step {STEPS-1}: torch {torch_losses[-1]:.6f}  "
          f"jax {jax_losses[-1]:.6f}")
    print(f"max relative diff over {STEPS} steps: {max(rel):.4%}")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
