"""
Offline text-feature extraction with a pretrained language model.

Behavioral port of reference precompute_text.py:44-452: HF AutoModel
(default bert-base-uncased), preprocessor chosen per model family, whole
paragraphs fed flat for cross-sentence context, features = concatenated
hidden-state layers --layers=-2,-1 (1536-d for BERT base), too-long inputs
either strided windows (--token_stride) or back-to-front sentence cutting;
outputs text_feat_<ident>.h5 + <ident>_sentence_splits.json with an atomic
temp-file move. The model runs with torch on CPU/host (a feature
preprocessing tool, not the TPU training path); requires the HF weights to
be available locally/cached (this image has no network egress).
"""

import json
import os
import shutil
import time
from copy import deepcopy
from pathlib import Path
from typing import Dict, List

import h5py
import numpy as np

from coot_videotext_tpu.data.text import (
    TextPreprocessing, get_text_preprocessor)
from coot_videotext_tpu.utils import arguments
from coot_videotext_tpu.utils.arguments import ArgParser
from coot_videotext_tpu.utils.general import get_timestamp_for_filename


class TextConverterDataset:
    """Paragraph -> flat token sequence dataset (reference :315)."""

    def __init__(self, tokenizer, text_dict: Dict[str, List[str]],
                 preprocessor, *, max_text_len: int = 512,
                 min_cut: int = 5, token_stride: bool = False,
                 add_special_tokens: bool = False) -> None:
        self.tokenizer = tokenizer
        self.text_dict = text_dict
        self.preprocessor = preprocessor
        self.max_text_len = max_text_len
        self.min_cut = min_cut
        self.token_stride = token_stride
        self.add_special_tokens = add_special_tokens
        self.keys = list(text_dict.keys())

    def __len__(self) -> int:
        return len(self.keys)

    def __getitem__(self, item: int):
        key = self.keys[item]
        processed_text = self.preprocessor(self.text_dict[key])
        par_tokens: List[List[int]] = []
        for sentence in processed_text:
            tok_str = self.tokenizer.tokenize(
                sentence, add_special_tokens=self.add_special_tokens)
            par_tokens.append(
                self.tokenizer.convert_tokens_to_ids(tok_str))

        total = sum(len(s) for s in par_tokens)
        if total > self.max_text_len and not self.token_stride:
            # cut sentences back-to-front, keep >= min_cut + EOS
            # (reference :379-409)
            original = [len(s) for s in par_tokens]
            new_lengths = deepcopy(original)
            for sent in reversed(range(len(new_lengths))):
                overshoot = sum(new_lengths) - 512
                if overshoot <= 0:
                    break
                new_lengths[sent] = max(self.min_cut,
                                        len(par_tokens[sent]) - overshoot)
            par_tokens_new = []
            for i, (old_len, new_len) in enumerate(zip(original,
                                                       new_lengths)):
                if old_len == new_len:
                    par_tokens_new.append(par_tokens[i])
                else:
                    par_tokens_new.append(
                        par_tokens[i][:new_len - 1]
                        + [par_tokens[i][-1]])
            par_tokens = par_tokens_new
            print(f"\nKey: {key}, Cut input {sum(original)} to "
                  f"{self.max_text_len}, new length: "
                  f"{sum(len(s) for s in par_tokens)}")

        sentence_lengths = [len(s) for s in par_tokens]
        flat = [w for s in par_tokens for w in s]
        return {"key": key, "tokens": np.asarray(flat, np.int64),
                "sentence_lengths": sentence_lengths}

    def collate_fn(self, batch):
        """Pad tokens + build masks (reference :418)."""
        lengths = [len(b["tokens"]) for b in batch]
        max_len = max(lengths)
        tokens = np.zeros((len(batch), max_len), np.int64)
        mask = np.zeros((len(batch), max_len), bool)
        for i, b in enumerate(batch):
            tokens[i, :lengths[i]] = b["tokens"]
            mask[i, :lengths[i]] = True
        return {"key": [b["key"] for b in batch], "tokens": tokens,
                "mask": mask, "lengths": lengths,
                "sentence_lengths": [b["sentence_lengths"]
                                     for b in batch]}


def main():
    parser = ArgParser(description=__doc__)
    parser.add_argument("dataset_name", type=str, help="dataset name")
    arguments.add_dataset_path_arg(parser)
    parser.add_argument("-t", "--test", action="store_true",
                        help="test only")
    parser.add_argument("--metadata_name", type=str, default="all")
    parser.add_argument("--cuda", action="store_true",
                        help="(compat) no effect; runs on host")
    parser.add_argument("--multi_gpu", action="store_true",
                        help="(compat) no effect")
    parser.add_argument("--model_path", type=str, default=None,
                        help="Cache path for transformers package.")
    parser.add_argument("--model_name", type=str,
                        default="bert-base-uncased")
    parser.add_argument("--model_source", type=str,
                        default="transformers")
    parser.add_argument("--layers", type=str, default="-2,-1")
    parser.add_argument("--batch_size", type=int, default=1)
    parser.add_argument("--workers", type=int, default=0)
    parser.add_argument("--add_name", type=str, default="")
    parser.add_argument("-f", "--force", action="store_true")
    parser.add_argument("--set_tokenizer", type=str, default="",
                        help=f"Manually define the preprocessor. Options: "
                             f"{TextPreprocessing.values()}")
    parser.add_argument("--add_special_tokens", action="store_true")
    parser.add_argument("--token_stride", action="store_true")
    parser.add_argument("--token_stride_factor", type=int, default=2)
    args = parser.parse_args()

    data_path = arguments.update_path_from_args(args)
    dataset_path = Path(data_path) / args.dataset_name
    model_name = args.model_name
    model_ident = (f"{args.model_source}_"
                   f"{model_name.replace('/', '--')}_{args.layers}")
    full_ident = (f"text_feat_{args.dataset_name}_meta_"
                  f"{args.metadata_name}_{model_ident}{args.add_name}")
    os.makedirs(dataset_path, exist_ok=True)
    lengths_file = dataset_path / f"{full_ident}_sentence_splits.json"
    data_file = dataset_path / f"{full_ident}.h5"
    if data_file.exists() and lengths_file.exists() and not args.force:
        print(f"{data_file} already exists. nothing to do.")
        return

    import torch as th
    from transformers import AutoModel, AutoTokenizer
    assert args.model_source == "transformers", (
        f"Model source unknown: {args.model_source}")
    tokenizer = AutoTokenizer.from_pretrained(model_name,
                                              cache_dir=args.model_path)
    model = AutoModel.from_pretrained(model_name,
                                      cache_dir=args.model_path)
    max_text_len = model.config.max_position_embeddings
    model.eval()

    # preprocessor per model family (reference :118-140)
    if args.set_tokenizer != "":
        preprocessor = get_text_preprocessor(args.set_tokenizer)
    elif model_name == "bert-base-uncased":
        preprocessor = get_text_preprocessor(TextPreprocessing.BERT_PAPER)
    elif model_name.startswith(("bert", "distilbert")):
        preprocessor = get_text_preprocessor(TextPreprocessing.BERT_NEW)
    elif model_name.startswith("gpt2"):
        preprocessor = get_text_preprocessor(TextPreprocessing.GPT2)
    else:
        print(f"WARNING: no text preprocessing defined for model "
              f"{model_name}, using simple preprocessing.")
        preprocessor = get_text_preprocessor(TextPreprocessing.SIMPLE)
    layer_list_int = [int(la.strip())
                      for la in args.layers.strip().split(",")]

    meta_file = dataset_path / f"meta_{args.metadata_name}.json"
    meta_dict = json.loads(meta_file.read_text(encoding="utf8"))
    text_dict = {key: [seg["text"] for seg in meta["segments"]]
                 for key, meta in meta_dict.items()}

    dataset = TextConverterDataset(
        tokenizer, text_dict, preprocessor, max_text_len=max_text_len,
        token_stride=args.token_stride,
        add_special_tokens=args.add_special_tokens)
    if args.test:
        for key, value in dataset[0].items():
            print(f"{key}: {value}\n")
        print("Test, stopping here.")
        return

    temp_file = dataset_path / \
        f"TEMP_{get_timestamp_for_filename()}_{full_ident}.h5"
    data_h5 = h5py.File(temp_file, "w")
    lengths = {}
    total_feat_dim = None
    bs = args.batch_size
    with th.no_grad():
        for start in range(0, len(dataset), bs):
            batch = dataset.collate_fn(
                [dataset[i] for i in
                 range(start, min(start + bs, len(dataset)))])
            tokens = th.from_numpy(batch["tokens"])
            mask = th.from_numpy(batch["mask"])
            total_max_seq_len = tokens.shape[1]
            if total_max_seq_len <= max_text_len:
                out = model(input_ids=tokens, attention_mask=mask,
                            output_hidden_states=True)
                features = np.concatenate(
                    [out["hidden_states"][n].numpy()
                     for n in layer_list_int], axis=-1)
            else:
                # strided windows with overlap (reference :213-241)
                stride = max_text_len // args.token_stride_factor
                positions = list(range(0, total_max_seq_len - stride,
                                       stride))
                print(f"Length {total_max_seq_len}! Split with window "
                      f"{max_text_len} stride {stride} into "
                      f"{len(positions)} windows")
                outs = []
                for pos in positions:
                    t = tokens[:, pos:pos + max_text_len]
                    m = mask[:, pos:pos + max_text_len]
                    o = model(input_ids=t, attention_mask=m,
                              output_hidden_states=True)
                    feats = []
                    for n in layer_list_int:
                        lf = o["hidden_states"][n]
                        if pos != 0:
                            lf = lf[:, stride:]
                        feats.append(lf.numpy())
                    outs.append(np.concatenate(feats, axis=-1))
                features = np.concatenate(outs, axis=1)
            if total_feat_dim is None:
                total_feat_dim = features.shape[-1]
            for i, key in enumerate(batch["key"]):
                feature = features[i, :batch["lengths"][i]]
                sentence_lengths = batch["sentence_lengths"][i]
                if feature.shape[0] != sum(sentence_lengths):
                    print(f"WARNING: feature len {feature.shape[0]} != "
                          f"sum sentence lengths "
                          f"{sum(sentence_lengths)} for {key}")
                data_h5[key] = feature
                lengths[key] = sentence_lengths
    data_h5.close()

    print(f"Wrote data to {temp_file}, moving to {data_file}")
    if data_file.is_file():
        os.remove(data_file)
        time.sleep(0.1)
    shutil.move(str(temp_file), str(data_file))
    lengths_file.write_text(json.dumps(lengths), encoding="utf8")
    print(f"Wrote sentence splits to {lengths_file}")
    print(f"Total feature dim of {len(layer_list_int)} layers is "
          f"{total_feat_dim}")


if __name__ == "__main__":
    main()
