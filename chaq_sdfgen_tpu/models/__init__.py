"""Model layer: config-driven SDF generation pipelines (exact / brute / JFA
hard modes and the differentiable soft model)."""
