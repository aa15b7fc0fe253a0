"""Async pose-graph worker (the reference's separate pose_graph process,
pose_graph_node.cpp:294-428): keyframes flow through the background thread,
results stream into pipe.pg_events, pg_join() drains + flushes, and the
frame loop never blocks on the loop stage."""
import numpy as np

import jax.numpy as jnp

from vins_tpu.sim.proxy import make_pipeline, run_proxy


def test_async_worker_processes_keyframes():
    pipe = make_pipeline(loop_closure=True, pg_async=True,
                         pg_skip_first_cnt=0, dtype=jnp.float64)
    assert pipe.pg_async and pipe._pg_thread.is_alive()
    run = run_proxy(duration=2.5, period=16.0, pipe=pipe, seed=0)
    # run_proxy calls pg_join: every queued keyframe is processed
    assert pipe._pg_queue.unfinished_tasks == 0
    done = [e for e in pipe.pg_events if "error" not in e]
    errs = [e for e in pipe.pg_events if "error" in e]
    assert not errs, errs
    assert len(done) >= 3  # keyframes flowed through the worker
    # dropped payloads never reach add_keyframe: every stored keyframe has a
    # worker result, and drops stay bounded on this short run
    assert len(done) == len(pipe.pose_graph.keyframes)
    assert pipe.pg_dropped <= len(done)
    # worker results carry the retrieval diagnostics the sync path has
    assert all("candidate" in e for e in done)
    # stamps are ordered (single worker, FIFO queue)
    stamps = [e["stamp"] for e in done]
    assert stamps == sorted(stamps)
