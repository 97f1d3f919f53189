"""Safe-RL algorithm suite: shared actor-critic, buffers, trust-region core,
and per-algorithm update rules (reference: safe_rl_libX/*)."""
