"""
Text preprocessing pipelines for feature extraction.

Behavioral port of reference nntrainer/data_text.py:14-130: named pipelines
(bert_paper, bert_new, gpt2, simple, nothing, with_dots) doing sentence
cleanup, dot handling, capitalization and [CLS]/[SEP] insertion.
"""

from __future__ import annotations

import re
from functools import partial
from typing import Callable, List, Optional

from coot_videotext_tpu.typext import ConstantHolder

RE_WHITESPACES = re.compile(r"\s+")


class TextPreprocessing(ConstantHolder):
    """Pipeline names (reference :14)."""
    BERT_NEW = "bert_new"
    BERT_PAPER = "bert_paper"
    GPT2 = "gpt2"
    SIMPLE = "simple"
    NOTHING = "nothing"
    WITH_DOTS = "with_dots"


def get_text_preprocessor(func: str) -> Callable[[List[str]], List[str]]:
    """Pipeline factory (reference :26)."""
    if func == TextPreprocessing.BERT_PAPER:
        return partial(preprocess_paragraph, begin_paragraph_token="[CLS]",
                       end_sentence_token="[SEP]", remove_ending_dot=True,
                       replace_inside_dots=True, capitalize=False)
    if func == TextPreprocessing.BERT_NEW:
        return partial(preprocess_paragraph, begin_paragraph_token="[CLS]",
                       end_sentence_token="[SEP]", remove_ending_dot=True,
                       replace_inside_dots=True)
    if func == TextPreprocessing.GPT2:
        return partial(preprocess_paragraph, add_space_before_token=False)
    if func == TextPreprocessing.SIMPLE:
        return preprocess_paragraph
    if func == TextPreprocessing.NOTHING:
        return partial(preprocess_paragraph, capitalize=False)
    if func == TextPreprocessing.WITH_DOTS:
        return partial(preprocess_paragraph, remove_ending_dot=True,
                       replace_inside_dots=True, capitalize=False)
    raise NotImplementedError(f"Text Processing '{func}' unknown")


def preprocess_paragraph(
        paragraph: List[str],
        begin_sentence_token: Optional[str] = None,
        end_sentence_token: Optional[str] = None,
        begin_paragraph_token: Optional[str] = None,
        end_paragraph_token: Optional[str] = None,
        add_space_before_token: bool = True,
        remove_ending_dot: bool = False,
        replace_inside_dots: bool = False,
        capitalize: bool = True) -> List[str]:
    """Preprocess a list of sentences (reference :56)."""
    new_paragraph = []
    space_before_token = " " if add_space_before_token else ""

    between_sentence_token = None
    if end_sentence_token is not None or begin_sentence_token is not None:
        between_sentence_token = (
            f"{'' if end_sentence_token is None else f'{end_sentence_token} '}"
            f"{'' if begin_sentence_token is None else f'{begin_sentence_token}'}")

    for num_sentence, sentence in enumerate(paragraph):
        sentence = RE_WHITESPACES.sub(" ", sentence).strip()
        assert len(sentence) > 0
        if remove_ending_dot:
            if (sentence[-1] == "." and len(sentence) > 1
                    and sentence[-2] != "."):
                sentence = sentence[:-1]
        else:
            if sentence[-1] != ".":
                sentence += "."
        if capitalize:
            sentence = sentence.capitalize()
        sentence = sentence.strip()

        if capitalize:
            find_pos = sentence.find(". ")
            if find_pos > -1:
                while True:
                    if find_pos > len(sentence):
                        break
                    find_pos += 1
                    if sentence[find_pos].isalnum():
                        sentence = (sentence[:find_pos]
                                    + sentence[find_pos:].capitalize())
                        break

        if replace_inside_dots and between_sentence_token is not None:
            sentence = sentence.replace(
                ". ",
                f"{'' if remove_ending_dot else '.'} "
                f"{between_sentence_token} ")

        new_words = []
        if begin_paragraph_token is not None and num_sentence == 0:
            new_words.append(begin_paragraph_token)
        if begin_sentence_token is not None:
            new_words.append(begin_sentence_token)
        for word in sentence.split(" "):
            word = word.strip()
            if word == "":
                continue
            new_words.append(f" {word}")
        if end_sentence_token is not None:
            new_words.append(f"{space_before_token}{end_sentence_token}")
        if (end_paragraph_token is not None
                and num_sentence == len(paragraph) - 1):
            new_words.append(f"{space_before_token}{end_paragraph_token}")
        new_paragraph.append("".join(new_words).strip())
    return new_paragraph
