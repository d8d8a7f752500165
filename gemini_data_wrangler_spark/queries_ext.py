"""Extension-operator query registrations (dedup / similarity / text /
window / streaming). Imported for side effects by ``queries.registry()``.

Filled in as extension modules land; see operators/dedup.py,
operators/similarity.py, functions/text.py, streaming/events.py.
"""

from __future__ import annotations
