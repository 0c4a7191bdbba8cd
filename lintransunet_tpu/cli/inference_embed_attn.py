"""Binary full-volume inference CLI (mirrors inference_embed_attn.py:1-190).

Per fold: load the best checkpoint, sliding-window inference with
512x512x{depth_size} windows / overlap 0.6 / constant blending, threshold
0.5, metric suite Dice/Recall/Precision/Localization, optional .npy export
of the class-1 channel permuted to (D, H, W), per-patient + aggregate JSON
summary (summary_4_fold.json schema).
"""

import argparse
import json
import os

import numpy as np


def get_parse():
    from lintransunet_tpu.core.config import InferenceConfig, add_dataclass_args

    parser = argparse.ArgumentParser()
    add_dataclass_args(parser, InferenceConfig())
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
    parser.add_argument("--attn_layers", type=int, default=8)
    return parser.parse_args()


def main(args):
    import jax
    import jax.numpy as jnp

    from lintransunet_tpu import core, engine, parallel
    from lintransunet_tpu.cli.common import (batched_predictions, build_model,
                                             make_eval_runner)
    from lintransunet_tpu.data import DataLoader, EvaPanCTDataset
    from lintransunet_tpu.data.split import load_fold
    from lintransunet_tpu.losses import binary as loss_module

    # batch-sharded multi-volume mode over all chips (BASELINE config 5)
    mesh = parallel.make_mesh() if jax.device_count() > 1 else None

    criterions = loss_module.get_criterions(list(args.criterion_list))
    final_loss = [0.0] * len(criterions)
    name_list = sorted(os.listdir(os.path.join(args.dir_data, "image")))
    out_dict = {}

    model = build_model(args)
    eval_cfg = core.EvalConfig(roi_size=args.roi_size,
                               depth_size=args.depth_size,
                               overlap=args.overlap)
    eval_fwd, runner = make_eval_runner(model, eval_cfg,
                                        sw_batch_size=args.sw_batch_size)

    if args.is_save:
        os.makedirs(args.saved_folder, exist_ok=True)

    for fold_num in range(args.fold_nums):
        _, test_ids = load_fold(args.split_json, fold_num)
        # the reference drops the last test id (inference_embed_attn.py:115)
        test_ids = test_ids[:-1]
        dataset = EvaPanCTDataset(root=args.dir_data,
                                  depth_size=args.depth_size, ids=test_ids)
        loader = DataLoader(dataset, batch_size=args.batch_size,
                            shuffle=False, num_workers=4)

        params = engine.restore_params(os.path.join(
            args.pretrained_dir, f"fold_{fold_num}", "temp_model"))
        # serving-time conv-kernel prepack (pure param transform, once per
        # checkpoint instead of inside every window forward)
        from lintransunet_tpu.models import prepack_params

        params = prepack_params(model, params, jnp.zeros(
            (1, args.roi_size, args.roi_size, args.depth_size, 1),
            jnp.bfloat16))

        summary_patient_loss = []
        total_loss = [0.0] * len(criterions)
        n = 0
        for i, images, masks, predict in batched_predictions(
                loader, runner, params, mesh=mesh):
            name = name_list[test_ids[i]]
            masks = masks.astype(np.int32)

            predict2 = (predict >= args.threshold).astype(jnp.float32)
            losses = [float(fn(predict2, jnp.asarray(masks)))
                      for fn in criterions.values()]

            if args.is_save:
                # class-1 channel, (H, W, D) -> (D, H, W)
                out = np.asarray(predict2[0, ..., 1]).transpose(2, 0, 1)
                np.save(os.path.join(args.saved_folder,
                                     "{:0>4}".format(name)), out)

            for loss_name, value in zip(criterions, losses):
                print(f"eval patient average {loss_name}", value)
            summary_patient_loss.append(losses)
            total_loss = [t + l for t, l in zip(total_loss, losses)]
            n += 1

        total_loss = [t / max(n, 1) for t in total_loss]
        final_loss = [f + t for f, t in zip(final_loss, total_loss)]
        for loss_name, value in zip(criterions, total_loss):
            print(f"eval total average {loss_name} loss", value)
        out_dict[f"patient_{fold_num}"] = summary_patient_loss
        out_dict[f"summary_{fold_num}"] = total_loss

    final_loss = [f / args.fold_nums for f in final_loss]
    for loss_name, value in zip(criterions, final_loss):
        print(f"eval final average {loss_name} loss", value)

    with open("summary_4_fold.json", "w") as f:
        json.dump(out_dict, f, indent=4)


if __name__ == "__main__":
    main(get_parse())
