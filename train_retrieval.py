"""
Run retrieval training / validation (CLI parity with reference
train_retrieval.py — same flags, config yaml surface, and output layout).
"""

import numpy as np

from coot_videotext_tpu.data.retrieval_dataset import (
    create_retrieval_datasets_and_loaders)
from coot_videotext_tpu.tasks.retrieval.config import (
    ExperimentTypesConst, RetrievalConfig as Config)
from coot_videotext_tpu.tasks.retrieval.model_manager import (
    RetrievalModelManager as ModelManager)
from coot_videotext_tpu.tasks.retrieval.trainer import (
    RetrievalTrainer as Trainer)
from coot_videotext_tpu.utils import arguments
from coot_videotext_tpu.utils.arguments import ArgParser
from coot_videotext_tpu.utils.yaml_utils import load_yaml_config_file

EXP_TYPE = ExperimentTypesConst.RETRIEVAL


def run_retrieval_dataset_test(train_set, train_loader) -> None:
    """Print one collated batch (reference dataset_retrieval.py:491)."""
    print(f"Dataset: {len(train_set)} datapoints, "
          f"{len(train_loader)} batches.")
    for batch in train_loader:
        for key, value in batch.items():
            if isinstance(value, np.ndarray):
                print(f"  {key}: {value.shape} {value.dtype}")
            else:
                print(f"  {key}: list[{len(value)}]")
        break


def main():
    # persistent XLA compile cache: restarted runs (auto-resume, chunked
    # A/B children) skip the ~40s-per-step-function TPU compiles
    from coot_videotext_tpu.utils.general import enable_compilation_cache
    enable_compilation_cache()

    parser = ArgParser(description=__doc__)
    arguments.add_default_args(parser)
    arguments.add_exp_identifier_args(parser)
    arguments.add_trainer_args(parser)
    arguments.add_dataset_test_arg(parser)
    parser.add_argument("--preload", action="store_true",
                        help="Preload video and text features into RAM.")
    parser.add_argument("--preload_device", action="store_true",
                        help="Force the HBM-resident feature store even "
                             "when the auto budget would decline it "
                             "(ships only gather indices per step - the "
                             "only transfer path that doesn't hit this "
                             "environment's axon per-transfer host "
                             "memory leak on long runs).")
    parser.add_argument("--fixed_shapes", action="store_true",
                        help="Pad batches to dataset-static shapes (one "
                             "XLA compile; with the device store this "
                             "enables the fully device-resident "
                             "index-batch pipeline). Ours-only flag — "
                             "the shared A/B yamls stay reference-schema.")
    parser.add_argument("--load_model", type=str, default=None,
                        help="Load model from file.")
    parser.add_argument("--save_embeddings", action="store_true",
                        help="Save generated COOT embeddings.")
    args = parser.parse_args()

    if args.save_embeddings:
        assert args.validate, (
            "Saving embeddings only works in validation with --validate")

    exp_group, exp_name, config_file = \
        arguments.setup_experiment_identifier_from_args(args, EXP_TYPE)
    config = load_yaml_config_file(config_file)
    path_data = arguments.update_path_from_args(args)
    config = arguments.update_config_from_args(config, args)
    if args.preload:
        for dset in ("dataset_train", "dataset_val"):
            config[dset]["preload_vid_feat"] = True
            config[dset]["preload_text_feat"] = True
    if args.preload_device:
        config["dataset_train"]["preload_device"] = True

    cfg = Config(config,
                 is_train=not args.validate and not args.test_dataset)
    if args.print_config:
        print(cfg)

    seed = cfg.random_seed if cfg.random_seed is not None else 0
    train_set, val_set, train_loader, val_loader = \
        create_retrieval_datasets_and_loaders(
            cfg, path_data, seed=seed,
            fixed_shapes=True if args.fixed_shapes else None)

    if args.test_dataset:
        run_retrieval_dataset_test(train_set, train_loader)
        return
    print("---------- Setup done!")

    for run_number in range(args.start_run,
                            args.start_run + args.num_runs):
        run_name = f"{args.run_name}{run_number}"
        model_mgr = ModelManager(cfg)
        load_best = args.load_best or args.validate
        trainer = Trainer(
            cfg, model_mgr, exp_group, exp_name, run_name,
            len(train_loader), log_dir=args.log_dir,
            reset=args.reset, load_best=load_best,
            load_epoch=args.load_epoch, load_model=args.load_model,
            is_test=args.validate)

        try:
            if args.validate:
                if (not trainer.load and not args.ignore_untrained):
                    raise ValueError(
                        "Validating an untrained model! No checkpoints were "
                        "loaded. Add --ignore_untrained to validate anyway.")
                trainer.validate_epoch(val_loader,
                                       val_clips=cfg.val.val_clips,
                                       save_embs=args.save_embeddings)
            else:
                trainer.train_model(train_loader, val_loader)
        except BaseException:
            # surface the traceback in logs/run_*.log so a detached run
            # that dies is diagnosable from the experiment dir alone
            # (reference behavior: errors land in the console log,
            # /root/reference/nntrainer/utils.py:56-103)
            trainer.logger.exception("Run aborted by uncaught exception:")
            raise
        trainer.close()
        del model_mgr, trainer


if __name__ == "__main__":
    main()
