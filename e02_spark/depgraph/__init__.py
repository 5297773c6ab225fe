"""SQL dependency scanner, owner mapping, and review gate — the reference's
three computational subsystems re-expressed as Spark DataFrame transforms.

scanner.py      function-def extraction, call-site extraction, dependency
                graph, one-hop flattening
                (reference: .github/scripts/scan_dependencies.py)
owners.py       glob->regex translation (bug-for-bug), pattern joins, owner
                aggregation (reference: .github/scripts/
                generate_codefacilitators.py + pr-review-flow.yml:127-155)
review_gate.py  keep-latest review dedup, existential team approval,
                3-stage gate (reference: pr-review-flow.yml:94-288)
"""
