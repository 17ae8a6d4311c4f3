"""Query/plan registry and plan-inspection helpers."""
