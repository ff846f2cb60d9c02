"""PEQ matching (reference examples/e7_peq.py): two scenarios x two
designs.

* ``peq`` — reference ``example_peq`` (e7_peq.py:16-116): train a MIMO
  parametric EQ to reproduce the response of another randomly initialized
  PEQ instance (self-identification).
* ``parallel_peq`` — reference ``example_parallel_peq`` (:118-216): the
  diagonal variant.

Each runs under both the biquad (RBJ) and SVF band designs this
framework's PEQ supports (reference dsp.py PEQ uses cookbook biquads).
"""

import sys, os
sys.path.insert(0, os.path.dirname(__file__))

import jax.numpy as jnp

from _common import example_parser, setup, train_filter_to_target


def example_peq(args, design):
    from flamo_tpu.processor import dsp

    in_ch, out_ch = 1, 2
    n_bands = 6

    target_src = dsp.PEQ(size=(out_ch, in_ch), n_bands=n_bands,
                         design=design, nfft=args.nfft, fs=args.samplerate)
    # (M, out, in) response applied to an impulse in every input channel
    target = jnp.abs(jnp.sum(target_src.response(), axis=-1))[None]

    filt = dsp.PEQ(size=(out_ch, in_ch), n_bands=n_bands, design=design,
                   nfft=args.nfft, fs=args.samplerate, requires_grad=True)
    train_filter_to_target(args, filt, target, in_ch,
                           tag=f"peq_{design}")


def example_parallel_peq(args, design):
    from flamo_tpu.processor import dsp

    ch = 2
    n_bands = 6

    target_src = dsp.parallelPEQ(size=(ch,), n_bands=n_bands,
                                 design=design, nfft=args.nfft,
                                 fs=args.samplerate)
    target = jnp.abs(target_src.response())[None]  # (1, M, ch)

    filt = dsp.parallelPEQ(size=(ch,), n_bands=n_bands, design=design,
                           nfft=args.nfft, fs=args.samplerate,
                           requires_grad=True)
    train_filter_to_target(args, filt, target, ch,
                           tag=f"parallel_peq_{design}")


def main(args):
    designs = (["biquad", "svf"] if args.design == "all"
               else [args.design])
    scenarios = {"peq": example_peq, "parallel_peq": example_parallel_peq}
    names = list(scenarios) if args.scenario == "all" else [args.scenario]
    for design in designs:
        for name in names:
            print(f"--- e7_peq scenario: {name} ({design} design) ---")
            scenarios[name](args, design)


if __name__ == "__main__":
    ap = example_parser(nfft=4096, max_epochs=3, lr=1e-2, num=16,
                        batch_size=2)
    ap.add_argument("--scenario", type=str, default="all",
                    choices=["peq", "parallel_peq", "all"])
    ap.add_argument("--design", type=str, default="all",
                    choices=["biquad", "svf", "all"])
    args = setup(ap.parse_args())
    main(args)
