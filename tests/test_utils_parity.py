"""
Ports of the reference's remaining unit tests (golden values identical):
maths/frame sampling (tests_nntrainer/test_maths.py), AverageMeter
(test_metrics.py), ConstantHolder (test_string_constant.py), text
preprocessing (test_text_preprocessing.py).
"""

import numpy as np
import pytest

from coot_videotext_tpu.data import text as data_text
from coot_videotext_tpu.typext import ConstantHolder
from coot_videotext_tpu.utils.maths import (
    ceil, compute_indices, floor, np_round_half_down, np_str_len, rnd)
from coot_videotext_tpu.utils.metrics import AverageMeter


def test_maths() -> None:
    """Golden values from reference tests_nntrainer/test_maths.py."""
    input_list = [["Lorem", "Ipsum"], ["Dolor", "Sit Amet"]]
    assert np.all(np_str_len(input_list) == np.array([[5, 5], [5, 8]]))
    assert np.all(np_str_len(np.array(input_list))
                  == np.array([[5, 5], [5, 8]]))
    with pytest.raises(TypeError):
        np_str_len(77)

    assert rnd(.7) == 1
    assert rnd(1.5) == 2
    assert rnd(2.5) == 2  # bankers rounding
    assert floor(.5) == 0
    assert ceil(.5) == 1
    assert np.all(np_round_half_down([0, 0.7, 0.5, 1.5]) == [0, 1, 0, 1])

    # center sampling goldens
    assert np.all(compute_indices(5, 10, is_train=False)
                  == [0, 0, 1, 1, 2, 2, 3, 3, 4, 4])
    assert np.all(compute_indices(8, 6, is_train=False)
                  == [0, 2, 3, 4, 6, 7])
    # seeded jittered sampling golden (reference used global np.random)
    np.random.seed(0)
    assert np.all(compute_indices(80, 6, is_train=True)
                  == [7, 20, 32, 49, 59, 78])


def test_averagemeter() -> None:
    meter = AverageMeter()
    meter.update(4, 2)
    assert (meter.value, meter.sum, meter.count, meter.avg) == (4, 8, 2, 4)
    meter.update(1)
    assert (meter.value, meter.sum, meter.count, meter.avg) == (1, 9, 3, 3)
    meter.reset()
    assert (meter.value, meter.sum, meter.count, meter.avg) == (0, 0, 0, 0)


def test_string_constant() -> None:
    class NewConst(ConstantHolder):
        FIELD = "some value"
        ANOTHER_FIELD = "another value"

    class DerivedConst(NewConst):
        THIRD_FIELD = "yet another value"

    assert ConstantHolder.keys() == []
    assert NewConst.keys() == ["FIELD", "ANOTHER_FIELD"]
    assert DerivedConst.keys() == NewConst.keys() + ["THIRD_FIELD"]
    assert NewConst.values() == ["some value", "another value"]
    assert "some value" in NewConst
    assert "missing" not in NewConst


def test_text_preprocessing() -> None:
    input_paragraph = [
        "A man and a women introduce themselves to the camera. "
        "They start to talk to each other.",
        " As the conversation ensues another woman approaches the woman "
        "and takes away her water bottle.",
        " Afterwards the man starts to play the bongos and woman starts "
        "to dance.",
        " As the woman dances on a man on a bike passes by and starts to "
        "observe what's going on..."]

    results = {
        data_text.TextPreprocessing.SIMPLE: [
            "A man and a women introduce themselves to the camera. "
            "They start to talk to each other.",
            "As the conversation ensues another woman approaches the "
            "woman and takes away her water bottle.",
            "Afterwards the man starts to play the bongos and woman "
            "starts to dance.",
            "As the woman dances on a man on a bike passes by and starts "
            "to observe what's going on..."],
        data_text.TextPreprocessing.BERT_PAPER: [
            "[CLS] A man and a women introduce themselves to the camera "
            "[SEP] They start to talk to each other [SEP]",
            "As the conversation ensues another woman approaches the "
            "woman and takes away her water bottle [SEP]",
            "Afterwards the man starts to play the bongos and woman "
            "starts to dance [SEP]",
            "As the woman dances on a man on a bike passes by and starts "
            "to observe what's going on... [SEP]"],
        data_text.TextPreprocessing.GPT2: [
            "A man and a women introduce themselves to the camera. "
            "They start to talk to each other.",
            "As the conversation ensues another woman approaches the "
            "woman and takes away her water bottle.",
            "Afterwards the man starts to play the bongos and woman "
            "starts to dance.",
            "As the woman dances on a man on a bike passes by and starts "
            "to observe what's going on..."],
    }
    for key, value in results.items():
        output = data_text.get_text_preprocessor(key)(input_paragraph)
        assert value == output, f"{key} failed:\n{output}\n{value}"

    truth = [
        "[BOP][BOS] A man and a women introduce themselves to the "
        "camera. [EOS] [BOS] They start to talk to each other. [EOS]",
        "[BOS] As the conversation ensues another woman approaches the "
        "woman and takes away her water bottle. [EOS]",
        "[BOS] Afterwards the man starts to play the bongos and woman "
        "starts to dance. [EOS]",
        "[BOS] As the woman dances on a man on a bike passes by and "
        "starts to observe what's going on... [EOS] [EOP]"]
    output = data_text.preprocess_paragraph(
        input_paragraph, begin_sentence_token="[BOS]",
        end_sentence_token="[EOS]", begin_paragraph_token="[BOP]",
        end_paragraph_token="[EOP]", remove_ending_dot=False,
        replace_inside_dots=True)
    assert output == truth, f"Failed:\n{output}\n{truth}"


def test_typed_named_tuple() -> None:
    """Shape-validated tuples (reference tests_nntrainer/test_types.py)."""
    import jax.numpy as jnp
    from coot_videotext_tpu.typext import TypedNamedTuple

    class ExampleTuple(TypedNamedTuple):
        key: str
        data: "jnp.ndarray"
        _shapes_dict = {"data": (None, 6)}

    t = ExampleTuple("k", jnp.zeros((4, 6)))
    assert t.key == "k"
    assert t.dict()["key"] == "k"
    assert t.tuple()[0] == "k"
    assert len(t) == 2
    with pytest.raises(AssertionError):
        ExampleTuple("k", jnp.zeros((4, 7)))
    with pytest.raises(AssertionError):
        ExampleTuple("k", jnp.zeros((4, 6, 1)))
    # nested containers are checked recursively
    class ListTuple(TypedNamedTuple):
        items: list
        _shapes_dict = {"items": (2,)}
    ListTuple([np.zeros(2), np.zeros(2)])
    with pytest.raises(AssertionError):
        ListTuple([np.zeros(2), np.zeros(3)])


def test_profiling_smoke() -> None:
    """Profiler + seeding smoke (reference test_profiling/test_torchutils)."""
    from coot_videotext_tpu.utils.profiling import (
        count_parameters, profile_device_and_ram, set_seed)
    stats = profile_device_and_ram()
    assert stats["ram_total"] > 0
    assert 0 <= stats["ram_percent"] <= 1
    set_seed(7)
    a = np.random.randint(0, 1000, 5)
    set_seed(7)
    b = np.random.randint(0, 1000, 5)
    np.testing.assert_array_equal(a, b)
    total, trainable = count_parameters({"w": np.zeros((3, 4)),
                                         "b": np.zeros(4)})
    assert total == trainable == 16


def test_ema_init_does_not_alias_params():
    """ema_init must COPY: astype(f32) on f32 params is a no-op alias, and
    a train state holding the same buffer twice fails TPU buffer donation
    at runtime (INVALID_ARGUMENT) — regression for the caption trainer."""
    import jax
    import jax.numpy as jnp
    from coot_videotext_tpu.train.optim import ema_init

    params = {"w": jnp.ones((4, 4), jnp.float32),
              "b": jnp.zeros((4,), jnp.float32)}
    ema = ema_init(params)
    for k in params:
        assert ema.shadow[k] is not params[k]
        if hasattr(params[k], "unsafe_buffer_pointer"):
            assert (ema.shadow[k].unsafe_buffer_pointer()
                    != params[k].unsafe_buffer_pointer())
        np.testing.assert_array_equal(np.asarray(ema.shadow[k]),
                                      np.asarray(params[k]))
