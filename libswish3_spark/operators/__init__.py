"""Query registry: every implemented operator as an oracle-checked query."""
