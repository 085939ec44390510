"""Shared test fixtures: tiny retrieval experiment config dicts."""

from __future__ import annotations

import copy
from typing import Any, Dict


def small_net_config(d_local: int = 32, d_global: int = 64,
                     ff: int = 32) -> Dict[str, Any]:
    return {
        "name": "transformer",
        "output_dim": d_local,
        "use_input_fc": True,
        "input_fc_config": {
            "output_dim": d_local, "num_layers": 1, "hidden_dim": 0,
            "activation_middle": "none", "activation_output": "gelu",
            "dropout_middle": 0, "dropout_output": 0,
            "norm_middle": "none", "norm_output": "none",
            "residual": "none",
        },
        "positional_encoding": "sincos",
        "add_local_cls_token": False,
        "dropout_input": 0,
        "norm_input": "layernorm_coot",
        "selfatn_config": {
            "hidden_dim": d_local, "num_layers": 1, "num_heads": 4,
            "pointwise_ff_dim": ff, "activation": "gelu",
            "dropout": 0.0, "norm": "layernorm_coot",
        },
        "use_context": False,
        "use_output_fc": False,
        "pooler_config": {
            "name": "atn", "hidden_dim": d_global, "num_heads": 2,
            "num_layers": 1, "dropout": 0.0, "activation": "gelu",
        },
        "weight_init_type": "truncnorm",
        "weight_init_std": 0.01,
    }


def retrieval_config_dict(dataset_overrides: Dict[str, Any], *,
                          batch_size: int = 8, num_epochs: int = 2,
                          d_local: int = 32, d_global: int = 64
                          ) -> Dict[str, Any]:
    """Full experiment config dict shaped like the reference yamls."""
    net_local = small_net_config(d_local, d_global)
    net_global = copy.deepcopy(net_local)
    net_global.update({
        "output_dim": d_global,
        "use_input_fc": False,
        "input_fc_config": None,
        "use_context": True,
        "crossatn_config": {
            "hidden_dim": d_local, "num_layers": 1, "num_heads": 4,
            "pointwise_ff_dim": 32, "activation": "gelu",
            "dropout": 0.0, "norm": "layernorm_coot",
        },
        "pooler_config": {"name": "avg_special"},
    })
    dataset_train = {
        "name": "synth", "subset": "default", "data_type": "retrieval",
        "split": "train", "metadata_name": "all",
        "vid_feat_name": "video_feat_synth", "vid_feat_source": "h5",
        "vid_feat_dim": 64,
        "text_feat_name": "text_feat_synth", "text_feat_source": "h5",
        "text_feat_dim": 48,
        "min_frames": 1, "max_frames": 16,
        "use_clips": True, "min_clips": 1, "max_clips": -1,
        "include_background": True,
        "frames_noise": 0, "words_noise": 0,
        "text_preprocessing": "bert_paper",
        "max_datapoints": -1, "shuffle": True,
        "add_stop_frame": 2, "expand_segments": 0,
        "preload_vid_feat": False, "preload_text_feat": False,
        "pin_memory": True, "num_workers": 0, "drop_last": False,
    }
    dataset_train.update(dataset_overrides)
    dataset_val = copy.deepcopy(dataset_train)
    dataset_val.update({"split": "val", "shuffle": False})
    return {
        "description": "synthetic retrieval test",
        "random_seed": 0,
        "config_type": "ret",
        "train": {
            "batch_size": batch_size,
            "num_epochs": num_epochs,
            "loss_func": "contrastive",
            "contrastive_loss_config": {
                "margin": 0.2,
                "weight_high": 1.0, "weight_high_internal": 1.0,
                "weight_low": 1.0, "weight_low_internal": 1.0,
                "weight_context": 1.0, "weight_context_internal": 0.0,
            },
            "loss_cycle_cons": 0.001,
            "clip_gradient": -1,
        },
        "val": {
            "batch_size": batch_size,
            "val_freq": 1, "val_start": 0,
            "val_clips": True, "val_clips_freq": 1,
            "det_best_field": "val_score_at_1",
            "det_best_compare_mode": "max",
            "det_best_threshold_mode": "rel",
            "det_best_threshold_value": 1e-4,
            "det_best_terminate_after": 16,
        },
        "dataset_train": dataset_train,
        "dataset_val": dataset_val,
        "net_video_local": net_local,
        "net_video_global": net_global,
        "net_text_local": copy.deepcopy(net_local),
        "net_text_global": copy.deepcopy(net_global),
        "logging": {"step_train": 10, "step_val": 10, "step_gpu": -1,
                    "step_gpu_once": 10},
        "saving": {"keep_freq": -1, "save_last": True, "save_best": True,
                   "save_opt_state": True},
        "optimizer": {
            "name": "radam", "lr": 3e-3, "weight_decay": 0,
            "weight_decay_for_bias": True, "momentum": 0.56,
            "sgd_nesterov": False, "adam_beta2": 0.98,
            "adam_eps": 1.5e-09, "adam_amsgrad": False,
            "radam_degentosgd": False, "lr_decay_mult": False,
        },
        "lr_scheduler": {
            "name": "reduce_opw", "warmup_type": "epoch",
            "warmup_epochs": 0, "rop_factor": 0.1, "rop_patience": 5,
            "rop_cooldown": 3, "rop_min_lr_factor": 0,
        },
        "use_cuda": True, "use_multi_gpu": False,
        "cudnn_enabled": True, "cudnn_benchmark": True,
        "cudnn_deterministic": False, "cuda_non_blocking": True,
        "fp16_train": False, "fp16_val": False,
    }


def caption_config_dict(overrides, *, batch_size: int = 4,
                        num_epochs: int = 2):
    """Full MART experiment config dict shaped like the reference yamls
    (config/caption/paper2020/yc2_100m_coot_vidclip_mart.yaml), tiny."""
    cfg = {
        "description": "synthetic caption test",
        "config_type": "mart",
        "train": {"batch_size": batch_size, "num_epochs": num_epochs,
                  "loss_func": "crossentropy", "clip_gradient": 1},
        "label_smoothing": 0.1,
        "val": {"batch_size": batch_size, "val_freq": 1, "val_start": 0,
                "det_best_field": "cider",
                "det_best_compare_mode": "max",
                "det_best_threshold_mode": "rel",
                "det_best_threshold_value": 1e-4,
                "det_best_terminate_after": 10},
        "save_mode": "best",
        "use_beam": False, "beam_size": 2, "n_best": 1,
        "min_sen_len": 5, "max_sen_len": 30, "block_ngram_repeat": 0,
        "length_penalty_name": "none", "length_penalty_alpha": 0.0,
        "dataset_train": {
            "name": "youcook2", "data_type": "auto", "subset": "default",
            "split": "train", "max_datapoints": -1, "shuffle": True,
            "pin_memory": True, "num_workers": 0, "drop_last": False,
            "preload": False},
        "dataset_val": {
            "name": "youcook2", "data_type": "auto", "subset": "default",
            "split": "val", "max_datapoints": -1, "shuffle": False,
            "pin_memory": True, "num_workers": 0, "drop_last": False,
            "preload": False},
        # small sentence-step budget: tracing the recursive model unrolls
        # (max_n_sen [+ add_val] x layers) python loops — the dominant
        # test-suite cost scales with it
        "max_n_sen": 3, "max_n_sen_add_val": 1,
        "max_t_len": 10, "max_v_len": 3,
        "type_vocab_size": 2, "word_vec_size": 32,
        "coot_model_name": "synthcoot",
        "coot_dim_clip": 32, "coot_dim_vid": 64,
        "coot_mode": "vidclip", "video_feature_size": 96,
        "random_seed": 0, "use_cuda": True, "debug": False,
        "cudnn_enabled": True, "cudnn_benchmark": True,
        "cudnn_deterministic": False, "use_multi_gpu": False,
        "cuda_non_blocking": True, "fp16_train": False,
        "fp16_val": False,
        "attention_probs_dropout_prob": 0.1,
        "hidden_dropout_prob": 0.1,
        "hidden_size": 32, "intermediate_size": 32,
        "layer_norm_eps": 1e-12, "memory_dropout_prob": 0.1,
        "num_attention_heads": 4, "num_hidden_layers": 2,
        "n_memory_cells": 1, "share_wd_cls_weight": False,
        "recurrent": True, "untied": False, "mtrans": False,
        "xl": False, "xl_grad": False,
        "use_glove": False, "freeze_glove": False,
        "ema_decay": 0.9999, "initializer_range": 0.02,
        "lr": 1e-3, "lr_warmup_proportion": 0.1,
        "logging": {"step_train": 5, "step_val": 5, "step_gpu": -1,
                    "step_gpu_once": 10},
        "saving": {"keep_freq": -1, "save_last": True, "save_best": True,
                   "save_opt_state": True},
    }
    cfg.update(overrides)
    return cfg
