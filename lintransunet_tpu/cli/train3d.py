"""Binary CT pancreas training CLI (mirrors train3D.py:1-297).

Same public flag surface (names/defaults from the reference argparse), same
orchestration: K-fold id loading, per-level criterion schedule, exponential
dynamic deep-supervision weights with warmup hold, eval every 5 epochs with
ReduceLROnPlateau + best-checkpoint save. Run:

    python -m lintransunet_tpu.cli.train3d --dir_data <root> --epochs 10
"""

import argparse
import os

import numpy as np


def get_parse():
    from lintransunet_tpu.core.config import (TrainConfig, add_dataclass_args)

    parser = argparse.ArgumentParser()
    add_dataclass_args(parser, TrainConfig())
    # model flags (train3D.py:42-72)
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
    parser.add_argument("--dim_output", type=int, default=2)
    parser.add_argument("--kernel_size", type=int, default=3)
    parser.add_argument("--compute_dtype", type=str, default="bfloat16")
    parser.add_argument("--image_crop", type=int, default=512)
    parser.add_argument("--attn_layers", type=int, default=8)
    # eval sliding-window depth (utils_3D_embed_full.py:135 hard-codes 64)
    parser.add_argument("--eval_depth", type=int, default=64)
    return parser.parse_args()


def _restore(args, fold_num, state, engine):
    """Resume: prefer the full train-state artifact (params, optimiser
    moments, step, epoch, best loss and plateau-scheduler state all survive,
    improving on the reference's params-only torch.save resume,
    train3D.py:113-117); fall back to the best-params artifact.
    Returns (state, aux) where aux carries the host-side schedule state."""
    full = os.path.join(args.pretrained_dir, f"fold_{fold_num}", "train_state")
    if os.path.isdir(full):
        return engine.restore_train_state(full, state)
    params = engine.restore_params(os.path.join(
        args.pretrained_dir, f"fold_{fold_num}", "temp_model"))
    return state.replace(params=params), {}


def main(args):
    import jax
    import jax.numpy as jnp

    from lintransunet_tpu import core, engine, models, parallel
    from lintransunet_tpu.cli.common import (build_model, get_criterion_list,
                                             make_eval_runner, run_dirs)
    from lintransunet_tpu.data import DataLoader, EvaPanCTDataset, IdPosPanCTDataset
    from lintransunet_tpu.data.split import load_fold
    from lintransunet_tpu.engine import loop
    from lintransunet_tpu.losses import binary as loss_module

    fold_num = args.fold_num
    num_devices = jax.device_count()
    batch_size = args.batch_size * num_devices
    step_times = max(args.num_samples // 3, 1)

    train_ids, test_ids = load_fold(args.split_json, fold_num)
    train_ds = IdPosPanCTDataset(
        root=args.dir_data, depth_size=args.depth_size,
        num_samples=args.num_samples, is_transform=args.is_transform,
        ids=train_ids, image_crop=args.image_crop, seed=args.seed)
    test_ds = EvaPanCTDataset(root=args.dir_data, depth_size=args.depth_size,
                              ids=test_ids)
    train_dl = DataLoader(train_ds, batch_size=batch_size, shuffle=True,
                          num_workers=12, seed=args.seed)
    test_dl = DataLoader(test_ds, batch_size=1, shuffle=False, num_workers=2)

    model = build_model(args)
    sample = jnp.zeros(
        (batch_size, args.image_crop, args.image_crop, args.depth_size, 1),
        jnp.float32)
    state = engine.create_train_state(
        model, jax.random.PRNGKey(args.seed), sample,
        learning_rate=args.learning_rate, step_times=step_times)
    resume_aux = {}
    if args.is_pretrained:
        state, resume_aux = _restore(args, fold_num, state, engine)

    # SPMD data parallelism over all chips (== nn.DataParallel,
    # train3D.py:119): batch sharded over the mesh, grads psum'd over ICI.
    mesh = parallel.make_mesh() if num_devices > 1 else None
    place = ((lambda a: parallel.shard_batch(mesh, a)) if mesh is not None
             else None)

    criterions, eval_criterions = get_criterion_list(
        len(args.num_layers), args.criterion_list, loss_module)
    step_fn = engine.make_train_step(model, criterions, mesh=mesh)

    eval_cfg = core.EvalConfig(roi_size=args.image_crop,
                               depth_size=getattr(args, "eval_depth", 64))
    eval_fwd, runner = make_eval_runner(model, eval_cfg)
    # eval-time conv-kernel prepack: one param transform per eval epoch
    # instead of one per window forward (models/packed.py:prepack_params)
    eval_plan = models.prepack_plan(model, jax.ShapeDtypeStruct(
        (1, eval_cfg.roi_size, eval_cfg.roi_size,
         eval_cfg.depth_size, model.dim_input), jnp.bfloat16))

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
    host_rng = np.random.default_rng(args.seed)
    jax_rng = jax.random.PRNGKey(args.seed + 1)

    for epoch in range(start_epoch, args.epochs):
        dynamic_weight = dynamic_weight_list[epoch]
        if epoch < args.warmup_step:
            dynamic_weight = dynamic_weight_list[0]

        if epoch % args.eval_epoch == 0:
            eval_loss, global_step = loop.eval_on_epoch(
                runner, test_dl, eval_criterions, writer, global_step,
                threshold=eval_cfg.threshold,
                runner_args=(models.prepack_params(
                    model, state.params, None, plan=eval_plan),))
            state = engine.set_learning_rate(state, scheduler.step(eval_loss))
            if eval_loss <= best_eval_loss:
                best_eval_loss = eval_loss
                engine.save_params(os.path.join(model_dir, "temp_model"),
                                   state.params)
                print("Best eval loss", eval_loss)

        state, train_loss, global_step = loop.train_on_epoch(
            state, train_dl, step_fn, dynamic_weight,
            patient_epochs=args.num_samples, patient_batchsize=batch_size,
            writer=writer, global_step=global_step, rng=host_rng,
            jax_rng=jax_rng, place=place)
        jax_rng = jax.random.fold_in(jax_rng, epoch)
        writer.add_scalar("lr_rate", engine.get_learning_rate(state),
                          global_step)
        print(f"epoch {epoch}: train loss {train_loss:.5f}")
        if epoch % args.eval_epoch == 0:
            # full-state checkpoint AFTER the epoch's training so resume
            # continues exactly at epoch+1 (engine/checkpoint.py)
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
