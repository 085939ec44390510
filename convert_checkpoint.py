"""
Convert a reference PyTorch checkpoint (model_<ep>.pth) to this framework.

The reference saves models as {model_name: state_dict} pth files
(nntrainer/model_manager_base.py:74-84). This tool converts one into an
orbax checkpoint loadable by the trainers here, or you can skip it and pass
the .pth directly to --load_model (the trainers convert on the fly).

Usage:
    python convert_checkpoint.py path/to/model_5.pth \
        -c config/retrieval/paper2020/yc2_100m_coot.yaml -o converted_ckpt
    python train_retrieval.py -c ... --load_model converted_ckpt --validate
"""

from __future__ import annotations

import argparse

from coot_videotext_tpu.utils.yaml_utils import load_yaml_config_file


def main() -> None:
    parser = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    parser.add_argument("checkpoint", help="reference model_<ep>.pth file")
    parser.add_argument("-c", "--config_file", required=True,
                        help="experiment yaml the checkpoint was trained with")
    parser.add_argument("-o", "--output", required=True,
                        help="output orbax checkpoint directory")
    args = parser.parse_args()

    from coot_videotext_tpu.train import checkpoint as ckpt
    from coot_videotext_tpu.utils import torch_convert

    torch_state = torch_convert.load_torch_model_state(args.checkpoint)
    config = load_yaml_config_file(args.config_file)

    if set(torch_state) == {"model"}:
        import jax as _jax
        import jax.numpy as jnp
        from coot_videotext_tpu.tasks.caption.config import MartConfig
        from coot_videotext_tpu.tasks.caption.model_manager import (
            MartModelManager, build_dummy_caption_batch,
            build_dummy_caption_batch_single, create_mart_model)
        cfg = MartConfig(config)
        sd = torch_state["model"]
        if "embeddings.word_embeddings.weight" in sd:
            vocab_size = sd["embeddings.word_embeddings.weight"].shape[0]
        else:  # masked-transformer ties the embedding to the out matrix
            vocab_size = sd["decoder.out.weight"].shape[0]
        model = create_mart_model(cfg, vocab_size=vocab_size, verbose=False)
        rngs = {"params": _jax.random.PRNGKey(0),
                "dropout": _jax.random.PRNGKey(0)}
        if cfg.model_type in ("untied_single", "mtrans_single"):
            b = build_dummy_caption_batch_single(cfg, vocab_size, 2,
                                                 untied=True)
            params = model.init(
                rngs, jnp.asarray(b["video_feature"]),
                jnp.asarray(b["video_mask"]), jnp.asarray(b["text_ids"]),
                jnp.asarray(b["text_mask"]),
                jnp.asarray(b["text_labels"]),
                deterministic=True)["params"]
        elif cfg.model_type == "single":
            b = build_dummy_caption_batch_single(cfg, vocab_size, 2)
            params = model.init(
                rngs, jnp.asarray(b["input_ids"]),
                jnp.asarray(b["video_feature"]),
                jnp.asarray(b["input_mask"]),
                jnp.asarray(b["token_type_ids"]),
                jnp.asarray(b["input_labels"]),
                deterministic=True)["params"]
        else:  # recurrent families (mart / xl) use the stacked layout
            mgr = MartModelManager(cfg, model)
            batch = build_dummy_caption_batch(cfg, vocab_size=vocab_size,
                                              batch_size=2)
            params = mgr.init_params(0, batch)
        template = {"params": params}
    else:
        from coot_videotext_tpu.tasks.retrieval.config import RetrievalConfig
        from coot_videotext_tpu.tasks.retrieval.model_manager import (
            RetrievalModelManager, build_dummy_retrieval_batch)
        cfg = RetrievalConfig(config)
        mgr = RetrievalModelManager(cfg)
        batch = build_dummy_retrieval_batch(cfg, batch_size=2)
        template = {"params": mgr.init_params(0, batch)}

    state = torch_convert.convert_model_file(args.checkpoint, template)
    import jax
    n = sum(p.size for p in jax.tree.leaves(state["params"]))
    ckpt.save_pytree(args.output, state)
    print(f"Converted {args.checkpoint} ({n:,} parameters) -> {args.output}")


if __name__ == "__main__":
    main()
