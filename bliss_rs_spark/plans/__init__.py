"""End-to-end lifecycles: build-then-query plans, flagship queries."""
