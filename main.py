"""Pipeline orchestration CLI.

Equivalent of the reference's main entry point (reference: main.py:22-101):
reads stage toggles and invokes each sub-pipeline's run() in the fixed
order graph-build → GCN training → word2vec → transformer → benchmarks →
PPI evaluation.  Adds what the reference lacked: CLI/JSON overrides for any
config knob (reference users edited config.py by hand).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="ProtGram-DirectGCN TPU pipeline")
    p.add_argument("--config", help="JSON config overrides file")
    p.add_argument("--set", action="append", default=[], metavar="KEY=VALUE",
                   help="dotted config override, e.g. --set gcn.lr=0.001")
    p.add_argument("--fasta", help="input FASTA path")
    p.add_argument("--out", help="base output directory")
    p.add_argument("--stages", help="comma list: graph,gcn,word2vec,transformer,benchmark,ppi,dummy")
    p.add_argument("--platform", choices=["tpu", "cpu"], default=None,
                   help="force a JAX platform (default: environment)")
    return p.parse_args(argv)


def _parse_value(raw: str):
    try:
        return json.loads(raw)
    except json.JSONDecodeError:
        return raw


def build_config(args):
    from protgram_directgcn_tpu.config import Config

    cfg = Config.from_json(args.config) if args.config else Config()
    for item in args.set:
        key, _, value = item.partition("=")
        cfg.apply_overrides({key: _parse_value(value)})
    if args.fasta:
        cfg.paths.input_fasta = __import__("pathlib").Path(args.fasta)
    if args.out:
        cfg.paths.base_output_dir = __import__("pathlib").Path(args.out)
    if args.stages is not None:
        wanted = {s.strip() for s in args.stages.split(",") if s.strip()}
        st = cfg.stages
        st.run_gcn_pipeline = "gcn" in wanted or "graph" in wanted
        st.run_word2vec_pipeline = "word2vec" in wanted
        st.run_transformer_pipeline = "transformer" in wanted
        st.run_benchmarking_pipeline = "benchmark" in wanted
        st.run_main_ppi_evaluation = "ppi" in wanted
        st.run_dummy_test = "dummy" in wanted
        cfg._only_graph = wanted == {"graph"}
    return cfg


def main(argv=None):
    args = parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    cfg = build_config(args)
    from protgram_directgcn_tpu.utils.io import logger

    if cfg.debug_verbose:  # reference: DEBUG_VERBOSE gates console verbosity
        import logging

        logger.setLevel(logging.DEBUG)

    # Multi-host runtime (no-op on a single host; see parallel/distributed.py).
    from protgram_directgcn_tpu.parallel.distributed import initialize_distributed

    initialize_distributed()

    t0 = time.monotonic()
    st = cfg.stages

    if st.run_gcn_pipeline:
        from protgram_directgcn_tpu.graph.builder import NgramGraphBuilder

        NgramGraphBuilder(cfg).run()
        if not getattr(cfg, "_only_graph", False):
            from protgram_directgcn_tpu.pipeline.trainer import HierarchicalTrainer

            HierarchicalTrainer(cfg).run()

    if st.run_word2vec_pipeline:
        from protgram_directgcn_tpu.pipeline.word2vec import Word2VecEmbedder

        Word2VecEmbedder(cfg).run()

    if st.run_transformer_pipeline:
        from protgram_directgcn_tpu.pipeline.transformer import TransformerEmbedder

        TransformerEmbedder(cfg).run()

    if st.run_benchmarking_pipeline:
        from protgram_directgcn_tpu.bench.gnn_benchmarker import GNNBenchmarker

        GNNBenchmarker(cfg).run()

    if st.run_main_ppi_evaluation or st.run_dummy_test:
        from protgram_directgcn_tpu.pipeline.ppi import PPIPipeline

        PPIPipeline(cfg).run(use_dummy_data=st.run_dummy_test)

    logger.info("pipeline finished in %.1fs", time.monotonic() - t0)
    return 0


if __name__ == "__main__":
    sys.exit(main())
