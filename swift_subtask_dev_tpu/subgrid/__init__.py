"""Subgrid physics models (reference src/cooling, src/entropy_floor,
src/star_formation, src/feedback — compile-time model stacks there,
composable objects here)."""
