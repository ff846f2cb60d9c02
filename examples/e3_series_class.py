"""Series semantics (reference examples/e3_series_class.py): IO mismatch
errors, OrderedDict keys, nesting flattening, nfft coherence errors."""

import sys, os
sys.path.insert(0, os.path.dirname(__file__))

from collections import OrderedDict

import jax.numpy as jnp

from _common import example_parser, setup


def main(args):
    from flamo_tpu.processor import dsp, system

    nfft = args.nfft

    # IO mismatch raises at construction
    try:
        system.Series(dsp.Gain(size=(3, 1), nfft=nfft),
                      dsp.Gain(size=(2, 4), nfft=nfft))
        raise RuntimeError("should have raised")
    except AssertionError as e:
        print("IO mismatch caught:", str(e)[:72], "...")

    # nfft coherence raises
    try:
        system.Series(dsp.Gain(size=(2, 1), nfft=nfft),
                      dsp.Gain(size=(2, 2), nfft=nfft * 2))
        raise RuntimeError("should have raised")
    except ValueError as e:
        print("nfft mismatch caught:", str(e)[:72], "...")

    # OrderedDict keys and nesting are flattened with unique keys
    inner = system.Series(OrderedDict({
        "a": dsp.Gain(size=(2, 1), nfft=nfft),
        "b": dsp.Gain(size=(2, 2), nfft=nfft)}))
    outer = system.Series(inner, OrderedDict({
        "c": dsp.Gain(size=(1, 2), nfft=nfft)}))
    print("flattened keys:", outer.keys)
    assert outer.keys == ("a", "b", "c")
    assert outer.input_channels == 1 and outer.output_channels == 1

    # duplicate keys raise
    try:
        system.Series(OrderedDict({"a": dsp.Gain(size=(2, 2), nfft=nfft)}),
                      OrderedDict({"a": dsp.Gain(size=(2, 2), nfft=nfft)}))
        raise RuntimeError("should have raised")
    except ValueError as e:
        print("duplicate key caught:", e)

    # functional append / prepend / insert
    s = system.Series(dsp.Gain(size=(2, 2), nfft=nfft))
    s2 = s.append(dsp.Gain(size=(3, 2), nfft=nfft)).prepend(
        dsp.Gain(size=(2, 1), nfft=nfft))
    print("after edits:", len(s), "->", len(s2), "modules;",
          s2.input_channels, "->", s2.output_channels, "channels")


if __name__ == "__main__":
    args = setup(example_parser(nfft=4096).parse_args())
    main(args)
