"""Route modules for the /v1/* contract (one Router per concern)."""
