"""Pure semantic kernels shared by the Ray stages and the synthetic
corpus generator.  No Ray imports here — everything is unit-testable in
isolation and pinned against hand-computed expectations in tests/."""
