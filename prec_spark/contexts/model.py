"""PRSC rule catalog: parsing, validation, signatures, well-behaved checks.

Re-implements (from its observable behavior, not its code) the PRSC
context machinery of the reference:

* rule parsing        — /root/reference/src/prsc/PrscRule.ts:41-94 (buildRule)
* template reading    — PrscRule.ts:109-156 (quoted triples, named-graph
                        templates, blank-node closure chasing)
* kappa (κ) triple characterization — src/prsc/index.ts:61-73
* signatures          — PrscRule.ts:170-245 (findSignatureOfRules)
* edge-unique detection — PrscRule.ts:252-258
* well-behaved checks — src/prsc/well-behaved-check.ts

All of this is driver-side: contexts are tiny. Only rule *application*
is distributed (prec_spark.prsc.apply).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..rdf.terms import (
    DEFAULT_GRAPH,
    PREC_NS,
    PVAR_NS,
    RDF_NS,
    XSD_STRING,
    BlankNode,
    Literal,
    NamedNode,
    Quad,
    Term,
)
from .quadset import QuadSet

RDF_TYPE = NamedNode(RDF_NS + "type")
PREC_PRSC_NODE_RULE = NamedNode(PREC_NS + "PRSCNodeRule")
PREC_PRSC_EDGE_RULE = NamedNode(PREC_NS + "PRSCEdgeRule")
PREC_LABEL = NamedNode(PREC_NS + "label")
PREC_PROPERTY_KEY = NamedNode(PREC_NS + "propertyKey")
PREC_PRODUCES = NamedNode(PREC_NS + "produces")
#: ENGINE EXTENSION (no reference counterpart — the reference's PRSC
#: emits only into the default graph, though its DStar matches on all
#: 4 positions, dataset/index.ts:257-271): a rule may declare
#: `prec:targetGraph <g>` and its produced triples land in that named
#: graph; apply_prsc(with_graphs=True) then emits (s, p, o, g) quads.
PREC_TARGET_GRAPH = NamedNode(PREC_NS + "targetGraph")
PREC_VALUE_OF = PREC_NS + "valueOf"
PREC_PLACEHOLDER = PREC_NS + "_placeholder"

PVAR_SELF = NamedNode(PVAR_NS + "self")
PVAR_NODE = NamedNode(PVAR_NS + "node")
PVAR_EDGE = NamedNode(PVAR_NS + "edge")
PVAR_SOURCE = NamedNode(PVAR_NS + "source")
PVAR_DESTINATION = NamedNode(PVAR_NS + "destination")

SELF_TERMS = (PVAR_SELF, PVAR_NODE, PVAR_EDGE)


@dataclass(frozen=True)
class Violation:
    kind: str
    identity: Term
    detail: str = ""


@dataclass
class PRSCRule:
    identity: Term
    kind: str  # 'node' | 'edge'
    labels: list[str]
    properties: list[str]
    template: list[Quad]
    #: optional output named graph (prec:targetGraph engine extension)
    graph: Term | None = None

    @property
    def labels_key(self) -> str:
        return "|".join(sorted(self.labels))

    @property
    def props_key(self) -> str:
        return "|".join(sorted(self.properties))


def walk_terms(term: Term):
    """Yield term and, for quads, all nested terms (pre-order)."""
    yield term
    if isinstance(term, Quad):
        for t in term.terms():
            yield from walk_terms(t)


def contains_term(quad: Term, target: Term) -> bool:
    return any(t == target for t in walk_terms(quad))


def map_terms(term: Term, fn) -> Term:
    """Rebuild a (possibly nested) quad applying fn to each leaf term
    (reference: eventuallyRebuildQuad, src/rdf/quad-star.ts:23-38)."""
    if isinstance(term, Quad):
        return Quad(map_terms(term.s, fn), map_terms(term.p, fn), map_terms(term.o, fn))
    return fn(term)


def characterize_triple(quad: Quad) -> Quad:
    """κ: Literal -> "Literal"^^prec:valueOf; BlankNode and pvar:* ->
    "BlankNode"^^prec:_placeholder; else identity
    (reference: characterizeTriple, src/prsc/index.ts:61-73)."""

    def fn(term: Term) -> Term:
        if isinstance(term, Literal):
            return Literal("Literal", PREC_VALUE_OF)
        if isinstance(term, BlankNode):
            return Literal("BlankNode", PREC_PLACEHOLDER)
        if isinstance(term, NamedNode) and term.value.startswith(PVAR_NS):
            return Literal("BlankNode", PREC_PLACEHOLDER)
        return term

    return map_terms(quad, fn)  # type: ignore[return-value]


def is_edge_unique_template(template: list[Quad]) -> bool:
    """Every template triple misses pvar:self/node/edge AND has both
    pvar:source and pvar:destination (PrscRule.ts:252-258)."""
    return all(
        not any(contains_term(t, st) for st in SELF_TERMS)
        and contains_term(t, PVAR_SOURCE)
        and contains_term(t, PVAR_DESTINATION)
        for t in template
    )


def _src_dest_compatible(t1: Term, t2: Term) -> bool:
    """Same-kappa triples must place pvar:source/destination identically
    (PrscRule.ts:265-289)."""
    if isinstance(t1, Quad) and isinstance(t2, Quad):
        return all(_src_dest_compatible(a, b) for a, b in zip(t1.terms(), t2.terms()))
    if type(t1) is not type(t2):
        return False
    if isinstance(t1, NamedNode) and isinstance(t2, NamedNode):
        if t1 == PVAR_SOURCE:
            return t2 == PVAR_SOURCE
        if t1 == PVAR_DESTINATION:
            return t2 == PVAR_DESTINATION
        if t2 in (PVAR_SOURCE, PVAR_DESTINATION):
            return False
    return True


@dataclass(frozen=True)
class SignatureTripleOf:
    rule_identity: Term
    kind: str  # 'node' | 'edge' | 'edge-unique'
    signature: Quad


@dataclass
class PRSCCatalog:
    rules: list[PRSCRule] = field(default_factory=list)

    # ---------------- parsing ----------------
    @classmethod
    def from_quads(cls, quads) -> "PRSCCatalog":
        ds = QuadSet(quads)
        rules: list[PRSCRule] = []
        violations: list[Violation] = []
        seen: set[Term] = set()
        for rule_type in (PREC_PRSC_NODE_RULE, PREC_PRSC_EDGE_RULE):
            for identity in ds.subjects_of_type(rule_type):
                if identity in seen:
                    continue
                seen.add(identity)
                rule, v = _build_rule(ds, identity)
                violations.extend(v)
                if rule is not None:
                    rules.append(rule)
        if violations:
            raise ContextViolations(violations)
        return cls(rules)

    @classmethod
    def from_turtle(cls, text: str) -> "PRSCCatalog":
        from ..rdf.turtle import parse_turtle

        return cls.from_quads(parse_turtle(text))

    # ---------------- signatures ----------------
    def signatures(self) -> list[SignatureTripleOf]:
        """Port of findSignatureOfRules (PrscRule.ts:170-245)."""
        found: dict[Quad, PRSCRule | None] = {}
        for rule in self.rules:
            for tt in rule.template:
                kappa = characterize_triple(tt)
                cur = found.get(kappa, "unset")
                if cur == "unset":
                    found[kappa] = rule
                elif cur is rule or cur is None:
                    pass
                else:
                    found[kappa] = None

        edge_uniques: set[Term] = set()
        for rule in self.rules:
            if rule.kind == "node" or not is_edge_unique_template(rule.template):
                continue
            edge_uniques.add(rule.identity)
            kappas = [characterize_triple(t) for t in rule.template]
            if any(found.get(k) is not rule for k in kappas):
                for k in kappas:
                    found[k] = None
                continue
            for i, ki in enumerate(kappas):
                for j, kj in enumerate(kappas):
                    if i == j or ki != kj:
                        continue
                    if not _src_dest_compatible(rule.template[i], rule.template[j]):
                        found[ki] = None
                        found[kj] = None

        result = []
        for rule in self.rules:
            sig = next(
                (t for t in rule.template if found.get(characterize_triple(t)) is rule),
                None,
            )
            if sig is not None:
                kind = (
                    "node" if rule.kind == "node"
                    else "edge-unique" if rule.identity in edge_uniques
                    else "edge"
                )
                result.append(SignatureTripleOf(rule.identity, kind, sig))
        return result

    # ---------------- well-behaved checks ----------------
    def element_identification(self, rule: PRSCRule) -> str:
        """'full' | 'edge-unique' | 'no'
        (elementIdentification, well-behaved-check.ts:26-51):
        * a template containing any blank node is never identifiable
          (produced blank nodes would be confusable with elements);
        * 'full' iff every triple carries pvar:self or the kind-specific
          pvar (pvar:node for node rules, pvar:edge for edge rules);
        * edges fall back to 'edge-unique' when every triple carries
          both pvar:source and pvar:destination."""
        for t in rule.template:
            if any(isinstance(x, BlankNode) for x in walk_terms(t)):
                return "no"
        other = PVAR_NODE if rule.kind == "node" else PVAR_EDGE
        if all(
            contains_term(t, PVAR_SELF) or contains_term(t, other)
            for t in rule.template
        ):
            return "full"
        if rule.kind == "edge" and all(
            contains_term(t, PVAR_SOURCE) and contains_term(t, PVAR_DESTINATION)
            for t in rule.template
        ):
            return "edge-unique"
        return "no"

    def all_signed(self) -> bool:
        return len(self.signatures()) == len(self.rules)

    def no_value_loss(self, rule: PRSCRule) -> bool:
        """The unique-kappa triples of the rule jointly expose EXACTLY
        src+dst (edges; nodes must expose neither) and exactly the
        rule's property set (noValueLoss, well-behaved-check.ts:81-116)."""
        kappa_count: dict[Quad, int] = {}
        for t in rule.template:
            k = characterize_triple(t)
            kappa_count[k] = kappa_count.get(k, 0) + 1
        uniques = [t for t in rule.template if kappa_count[characterize_triple(t)] == 1]

        found_src = found_dst = False
        labels: set[str] = set()
        for t in uniques:
            for term in walk_terms(t):
                if isinstance(term, Literal) and term.datatype == PREC_VALUE_OF:
                    labels.add(term.value)
                if term == PVAR_SOURCE:
                    found_src = True
                if term == PVAR_DESTINATION:
                    found_dst = True
        is_edge = rule.kind == "edge"
        if found_src != is_edge or found_dst != is_edge:
            return False
        return labels == set(rule.properties)

    def edge_unique_clashes(self, edge_unique_rules: list[PRSCRule]) -> list[PRSCRule]:
        """Edge-unique rules whose template κ-set intersects another
        rule's κ-set (findEdgeUniqueViolations intent,
        well-behaved-check.ts:149-235)."""
        clashing = []
        for eu in edge_unique_rules:
            eu_kappas = {characterize_triple(t) for t in eu.template}
            for other in self.rules:
                if other is eu:
                    continue
                if eu_kappas & {characterize_triple(t) for t in other.template}:
                    clashing.append(eu)
                    break
        return clashing

    def well_behaved(self) -> bool:
        """wellBehavedCheck (well-behaved-check.ts:245-281)."""
        edge_uniques = []
        for r in self.rules:
            ident = self.element_identification(r)
            if ident == "no":
                return False
            if ident == "edge-unique":
                edge_uniques.append(r)
            if not self.no_value_loss(r):
                return False
        if not self.all_signed():
            return False
        if self.edge_unique_clashes(edge_uniques):
            return False
        return True


class ContextViolations(Exception):
    def __init__(self, violations: list[Violation]):
        self.violations = violations
        super().__init__("; ".join(f"{v.kind}({v.detail})" for v in violations))


def _build_rule(ds: QuadSet, identity: Term):
    """buildRule (PrscRule.ts:41-94)."""
    violations: list[Violation] = []
    kind = None
    types = ds.follow_all(identity, RDF_TYPE)
    if len(types) != 1:
        violations.append(Violation("rule_bad_type_qtt", identity, "must have exactly one type"))
    elif types[0] == PREC_PRSC_NODE_RULE:
        kind = "node"
    elif types[0] == PREC_PRSC_EDGE_RULE:
        kind = "edge"
    else:
        violations.append(Violation("rule_given_bad_type", identity, types[0].nt()))

    def xsd_strings(pred):
        out = []
        for o in ds.follow_all(identity, pred):
            if not isinstance(o, Literal) or o.datatype != XSD_STRING or o.language:
                raise ValueError(f"{identity.nt()} {pred.nt()} objects must be xsd:string literals")
            out.append(o.value)
        return out

    labels = xsd_strings(PREC_LABEL)
    properties = xsd_strings(PREC_PROPERTY_KEY)
    template = _read_template(ds, identity)

    graph = None
    graph_objs = ds.follow_all(identity, PREC_TARGET_GRAPH)
    if len(graph_objs) > 1:
        raise ValueError(f"{identity.nt()}: at most one prec:targetGraph")
    if graph_objs:
        if not isinstance(graph_objs[0], NamedNode):
            raise ValueError(f"{identity.nt()}: prec:targetGraph must be an IRI")
        graph = graph_objs[0]

    for tt in template:
        for term in walk_terms(tt):
            if (
                isinstance(term, Literal)
                and term.datatype == PREC_VALUE_OF
                and term.value not in properties
            ):
                violations.append(
                    Violation("template_has_invalid_prop_name", identity, term.value)
                )

    if kind == "node":
        for tt in template:
            if contains_term(tt, PVAR_SOURCE) or contains_term(tt, PVAR_DESTINATION):
                violations.append(
                    Violation(
                        "template_has_invalid_prop_name",
                        identity,
                        "pvar:source or pvar:destination",
                    )
                )
                break

    if violations:
        return None, violations
    return PRSCRule(identity, kind, labels, properties, template, graph), []


def _read_template(ds: QuadSet, identity: Term) -> list[Quad]:
    """readTemplate (PrscRule.ts:109-156): quoted triples + blank-node
    closure chasing, or named-graph template bodies."""
    seen: set[Quad] = set()
    template: list[Quad] = []
    for obj in ds.follow_all(identity, PREC_PRODUCES):
        if isinstance(obj, Quad):
            if obj in seen:
                continue
            seen.add(obj)
            template.append(obj)
            frontier = [obj]
            while frontier:
                q = frontier.pop()
                bns = [t for t in walk_terms(q) if isinstance(t, BlankNode)]
                for bn in bns:
                    for occ in ds.match(s=bn, g=DEFAULT_GRAPH):
                        as_triple = Quad(occ.s, occ.p, occ.o)
                        if as_triple not in seen:
                            seen.add(as_triple)
                            template.append(as_triple)
                            frontier.append(as_triple)
        elif isinstance(obj, (BlankNode, NamedNode)):
            graph_content = ds.match(g=obj)
            if not graph_content:
                raise ValueError(
                    f"{identity.nt()} prec:produces {obj.nt()}: graph is empty"
                )
            for q in graph_content:
                template.append(Quad(q.s, q.p, q.o))
        else:
            raise ValueError(f"Invalid object for prec:produces in rule {identity.nt()}")
    return template
