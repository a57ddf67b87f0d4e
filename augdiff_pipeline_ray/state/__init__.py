"""Stateful components: sharded dependency-index actor pool, STRtree, lineage checkpoints."""
