"""Cached-pipeline training CLI (mirrors train3D_monai_version.py:1-302).

Uses the CachePanDataset (deterministic preprocessing cached in RAM at
construction, random crops/flips/rot90 per access) and the MONAI-loop
semantics: dict-style batches, ONE optimiser step per batch — no inner
patient loop, no gradient accumulation (utils/utils_3D_monai.py:45-105).
"""

import argparse
import os

import numpy as np


def get_parse():
    from lintransunet_tpu.core.config import TrainConfig, add_dataclass_args

    cfg = TrainConfig(
        criterion_list=("CrossEntroLoss", "DiceClassLoss", "DiceClassLoss2"),
        criterion_weight=(10.0, 1.0, 2.0),
        plateau_factor=0.6,
        plateau_patience=4,
        num_classes=3,
    )
    parser = argparse.ArgumentParser()
    add_dataclass_args(parser, cfg)
    parser.add_argument("--model_name", type=str, default="MaskTransUnet")
    parser.add_argument("--num_layers",
                        type=lambda s: tuple(int(x) for x in s.split(",")),
                        default=(16, 32, 64, 128, 256))
    parser.add_argument("--roi_size_list",
                        type=lambda s: tuple(int(x) for x in s.split(",")),
                        default=(100, 65, 40, 25, 10))
    parser.add_argument("--is_roi_list",
                        type=lambda s: tuple(x.lower() in ("1", "true")
                                             for x in s.split(",")),
                        default=(False, True, True, True, True))
    parser.add_argument("--dim_input", type=int, default=1)
    parser.add_argument("--dim_output", type=int, default=3)
    parser.add_argument("--kernel_size", type=int, default=3)
    parser.add_argument("--compute_dtype", type=str, default="bfloat16")
    parser.add_argument("--image_crop", type=int, default=512)
    parser.add_argument("--attn_layers", type=int, default=8)
    # eval sliding-window depth (utils_3D_embed_full.py:135 hard-codes 64)
    parser.add_argument("--eval_depth", type=int, default=64)
    # Spacingd/Orientationd controls (CT_pancreas_monai.py:47-48 applies
    # both unconditionally; NIfTI affines override source_spacing/axcodes)
    parser.add_argument("--no_resample", action="store_true",
                        help="skip Spacingd resampling to pixdim")
    parser.add_argument("--no_orient", action="store_true",
                        help="skip Orientationd-to-RAS")
    parser.add_argument("--source_spacing",
                        type=lambda s: tuple(float(x) for x in s.split(",")),
                        default=(1.0, 1.0, 1.0),
                        help="per-axis mm spacing of .npy sources")
    parser.add_argument("--source_axcodes", type=str, default="SRA",
                        help="anatomical axis codes of .npy sources")
    return parser.parse_args()


def main(args):
    import jax
    import jax.numpy as jnp

    from lintransunet_tpu import core, engine, models, parallel
    from lintransunet_tpu.cli.common import (build_model,
                                             get_multi_criterion_list,
                                             make_eval_runner, run_dirs)
    from lintransunet_tpu.data import CachePanDataset, DataLoader, EvaPanDataset
    from lintransunet_tpu.data.split import load_fold
    from lintransunet_tpu.engine import loop
    from lintransunet_tpu.losses import multiclass as loss_module

    fold_num = args.fold_num
    num_devices = jax.device_count()
    batch_size = args.batch_size * num_devices

    train_ids, test_ids = load_fold(args.split_json, fold_num)
    prep = dict(
        resample=not getattr(args, "no_resample", False),
        orient=not getattr(args, "no_orient", False),
        source_spacing=getattr(args, "source_spacing", (1.0, 1.0, 1.0)),
        source_axcodes=getattr(args, "source_axcodes", "SRA"))
    train_ds = CachePanDataset(root=args.dir_data, depth_size=args.depth_size,
                               num_samples=1, ids=train_ids,
                               image_crop=args.image_crop, seed=args.seed,
                               **prep)
    test_ds = EvaPanDataset(root=args.dir_data, depth_size=args.depth_size,
                            ids=test_ids, **prep)
    train_dl = DataLoader(train_ds, batch_size=batch_size, shuffle=True,
                          num_workers=8, seed=args.seed)
    test_dl = DataLoader(test_ds, batch_size=1, shuffle=False, num_workers=2)

    model = build_model(args)
    sample = jnp.zeros(
        (batch_size, args.image_crop, args.image_crop, args.depth_size, 1),
        jnp.float32)
    # One step per batch: no accumulation (utils_3D_monai.py:103-105).
    state = engine.create_train_state(
        model, jax.random.PRNGKey(args.seed), sample,
        learning_rate=args.learning_rate, step_times=1)
    resume_aux = {}
    if args.is_pretrained:
        full = os.path.join(args.pretrained_dir, f"fold_{fold_num}",
                            "train_state")
        if os.path.isdir(full):
            state, resume_aux = engine.restore_train_state(full, state)
        else:
            params = engine.restore_params(os.path.join(
                args.pretrained_dir, f"fold_{fold_num}", "temp_model"))
            state = state.replace(params=params)

    mesh = parallel.make_mesh() if num_devices > 1 else None
    place = ((lambda a: parallel.shard_batch(mesh, a))
             if mesh is not None else jnp.asarray)

    criterions, eval_criterions = get_multi_criterion_list(
        len(args.num_layers), args.criterion_list, loss_module)
    step_fn = engine.make_train_step(
        model, criterions, criterion_weight=list(args.criterion_weight),
        num_classes=args.num_classes, mesh=mesh)

    eval_cfg = core.EvalConfig(roi_size=args.image_crop,
                               depth_size=getattr(args, "eval_depth", 64))
    eval_fwd, runner = make_eval_runner(model, eval_cfg)
    # eval-time conv-kernel prepack: one param transform per eval epoch
    # instead of one per window forward (models/packed.py:prepack_params)
    eval_plan = models.prepack_plan(model, jax.ShapeDtypeStruct(
        (1, args.image_crop, args.image_crop,
         getattr(args, "eval_depth", 64), model.dim_input), jnp.bfloat16))

    scheduler = engine.ReduceLROnPlateau(
        lr=args.learning_rate, factor=args.plateau_factor,
        patience=args.plateau_patience, threshold=args.plateau_threshold,
        cooldown=args.plateau_cooldown, min_lr=args.min_lr)
    if resume_aux.get("scheduler"):
        scheduler = engine.ReduceLROnPlateau(**resume_aux["scheduler"])
        state = engine.set_learning_rate(state, scheduler.lr)

    log_dir, model_dir = run_dirs(args.log_dir, args.model_dir, fold_num)
    writer = engine.MetricWriter(log_dir)

    dynamic_weight_list = engine.get_dynamic_weight(
        epochs=args.epochs, T=args.weight_T, warmup_step=args.warmup_step,
        weight_list=args.weight_list, initial_weight=args.initial_weight,
        final_weight=args.final_weight)

    best_eval_loss = resume_aux.get("best_eval_loss", float("inf"))
    global_step = resume_aux.get("global_step", 0)
    start_epoch = resume_aux.get("epoch", -1) + 1
    jax_rng = jax.random.PRNGKey(args.seed + 1)

    for epoch in range(start_epoch, args.epochs):
        dynamic_weight = dynamic_weight_list[epoch]
        if epoch < args.warmup_step:
            dynamic_weight = dynamic_weight_list[0]
        dyn_w = jnp.asarray(dynamic_weight, jnp.float32)

        if epoch % args.eval_epoch == 0:
            eval_loss, global_step = loop.eval_on_epoch(
                runner, test_dl, eval_criterions, writer, global_step,
                num_classes=args.num_classes,
                selection_metrics=("DiceClassLoss", "DiceClassLoss2"),
                runner_args=(models.prepack_params(
                    model, state.params, None, plan=eval_plan),))
            state = engine.set_learning_rate(state, scheduler.step(eval_loss))
            if eval_loss <= best_eval_loss:
                best_eval_loss = eval_loss
                engine.save_params(os.path.join(model_dir, "temp_model"),
                                   state.params)
                print("Best eval loss", eval_loss)

        epoch_loss = 0.0
        n = 0
        for images, masks in train_dl:
            images = images.reshape((-1,) + images.shape[2:])
            masks = masks.reshape((-1,) + masks.shape[2:])
            if mesh is not None and images.shape[0] % num_devices:
                # SPMD needs batch % devices == 0; pad ragged tail batches
                # by wrap-around repeats (torch DistributedSampler style)
                target = (-images.shape[0]) % num_devices + images.shape[0]
                idx = np.arange(target) % images.shape[0]
                images = np.take(images, idx, axis=0)
                masks = np.take(masks, idx, axis=0)
            jax_rng, sub = jax.random.split(jax_rng)
            state, loss, _ = step_fn(
                state, place(images),
                place(masks.astype(np.int32)), dyn_w, sub)
            epoch_loss += float(loss)
            n += 1
        writer.add_scalar("train/total_loss", epoch_loss / max(n, 1),
                          global_step)
        print(f"epoch {epoch}: train loss {epoch_loss / max(n, 1):.5f}")
        global_step += 1
        if epoch % args.eval_epoch == 0:
            engine.save_train_state(
                os.path.join(model_dir, "train_state"), state,
                aux={"epoch": epoch, "best_eval_loss": best_eval_loss,
                     "global_step": global_step,
                     "scheduler": scheduler.state_dict()})

    engine.save_checkpoint(os.path.join(model_dir, "model"),
                           {"params": state.params})
    writer.close()


if __name__ == "__main__":
    main(get_parse())
