"""Pure numpy codec kernels. No Spark imports here — unit-testable standalone."""
