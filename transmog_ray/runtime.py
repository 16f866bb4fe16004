"""Ray Data execution-context defaults for this engine.

Central place for the DataContext knobs every entry point (tests, bench,
__ray_entry__, CLI) applies. Never calls ``ray.init`` — session ownership
stays with the caller (driver contract).
"""

from __future__ import annotations


def configure_context(
    target_max_block_size: int | None = None,
    preserve_order: bool = False,
    quiet: bool = True,
) -> None:
    """Apply engine defaults to the current ``DataContext``.

    * tensor-extension casting OFF — flatten output carries ragged
      ``list<string>`` columns (SMART-mode inline arrays) that must stay
      plain Arrow lists, not TensorArrays.
    * progress bars / verbose logs off by default (tests, bench).
    * ``preserve_order`` stays False unless a pipeline genuinely needs
      input order (windowed ops sort explicitly, so they don't).
    """
    from ray.data import DataContext

    import os

    ctx = DataContext.get_current()
    ctx.enable_tensor_extension_casting = False
    try:
        from ray.data.context import ShuffleStrategy

        # push-based sort shuffle: ~2x faster all-to-all than pull-based
        # for the bucketed groupby exchanges this engine is built on.
        # GRAFT_SHUFFLE=hash switches to the actor-aggregator hash shuffle
        # (tuned parallelism/aggregators via GRAFT_SHUFFLE_PARALLELISM /
        # GRAFT_SHUFFLE_AGGREGATORS) — faster on some shapes, measure.
        if os.environ.get("GRAFT_SHUFFLE") == "hash":
            ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
            ctx.default_hash_shuffle_parallelism = int(
                os.environ.get("GRAFT_SHUFFLE_PARALLELISM", "32")
            )
            ctx.max_hash_shuffle_aggregators = int(
                os.environ.get("GRAFT_SHUFFLE_AGGREGATORS", "8")
            )
        else:
            ctx.shuffle_strategy = ShuffleStrategy.SORT_SHUFFLE_PUSH_BASED
    except ImportError:  # pragma: no cover — older Ray
        pass
    try:
        # Ray's read-split default (200 blocks minimum) chops small-SF
        # tables into ~1-3k-row blocks, and every downstream map task
        # pays per-task overhead on a sliver of work. A LOW floor (8)
        # lets Ray's native by-bytes splitting govern instead: few-MB
        # tables get 8 chunky blocks (measured 2-4x faster per stage
        # than 32-64 slivers, BASELINE.md round 3), while big inputs
        # still split by file/row-group size — the floor is only a
        # minimum, so the rule scales.
        env_min = os.environ.get("GRAFT_READ_MIN_BLOCKS")
        ctx.read_op_min_num_blocks = int(env_min) if env_min is not None else 8
    except (ImportError, AttributeError):  # pragma: no cover — older Ray
        pass
    if os.environ.get("GRAFT_NO_RESERVATION") == "1":
        # ~20% faster for all-task pipelines (the 50% downstream
        # reservation idles half the cores under the flatten stage);
        # UNSAFE with actor pools — they need the reservation to avoid
        # starving upstream reads, so this stays opt-in
        ctx.op_resource_reservation_enabled = False
    if target_max_block_size is not None:
        ctx.target_max_block_size = target_max_block_size
    ctx.execution_options.preserve_order = preserve_order
    if quiet:
        ctx.enable_progress_bars = False
        try:
            ctx.execution_options.verbose_progress = False
        except AttributeError:  # pragma: no cover
            pass


__all__ = ["configure_context"]
