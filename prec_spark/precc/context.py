"""PREC-C context compilation (driver-side).

Re-implements, from observed behavior, the context machinery of
/root/reference/src/prec-c/context-loader.ts + Context.ts:

* builtin template catalog (re-authored below from the documented
  public vocabulary; semantics of src/builtin_rules.ttl)
* synonym replacement (Relationship* -> Edge*, context-loader.ts:543-583)
* sugar expansion (`iri prec:IRIOfX "label"` -> full rule,
  context-loader.ts:598-619; prec:Properties fan-out :630-639)
* rule splitting (label / priority / other conditions / templatedBy /
  substitutions, context-loader.ts:154-233)
* template building with substitutions (_buildTemplate :323-355) and
  self-identity deduction (readRawTemplate + findImplicitSelfIdentity
  :262-385)
* priority ordering (sortArrayByPriority :28-47): rules without
  explicit priority first, then ascending priority; ties broken by
  more-conditions-first then a stable serialized-conditions string —
  "first match wins" becomes a deterministic total order.

Everything here is tiny driver-side data; application is distributed
(prec_spark.precc.apply).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from ..contexts.quadset import QuadSet
from ..rdf.terms import (
    DEFAULT_GRAPH,
    PGO_NS,
    PREC_NS,
    PVAR_NS,
    RDF_NS,
    XSD_INTEGER,
    BlankNode,
    Literal,
    NamedNode,
    Quad,
    Term,
)
from ..rdf.turtle import parse_turtle
from ..contexts.model import map_terms

prec = lambda s: NamedNode(PREC_NS + s)  # noqa: E731
pvar = lambda s: NamedNode(PVAR_NS + s)  # noqa: E731
rdf = lambda s: NamedNode(RDF_NS + s)  # noqa: E731
pgo = lambda s: NamedNode(PGO_NS + s)  # noqa: E731

# ---------------------------------------------------------------------------
# Builtin templates. Same public prec:/pvar: vocabulary and semantics as the
# reference's src/builtin_rules.ttl (authored fresh; the template CONTENT is
# the published PREC-C exchange format, not implementation code).
# ---------------------------------------------------------------------------
BUILTIN_TEMPLATES_TTL = """
PREFIX prec: <http://bruy.at/prec#>
PREFIX pvar: <http://bruy.at/prec-trans#>
PREFIX pgo:  <http://ii.uwb.edu.pl/pgo#>
PREFIX rdf:  <http://www.w3.org/1999/02/22-rdf-syntax-ns#>

prec:RDFReification a prec:EdgeTemplate ;
  prec:selfIs pvar:edge ;
  prec:produces
    << pvar:edge rdf:type pgo:Edge >> ,
    << pvar:edge rdf:subject   pvar:source      >> ,
    << pvar:edge rdf:predicate pvar:edgeIRI     >> ,
    << pvar:edge rdf:object    pvar:destination >> .

prec:RdfStarUnique a prec:EdgeTemplate ;
  prec:selfIs << pvar:source pvar:edgeIRI pvar:destination >> ;
  prec:produces
    <<    pvar:source pvar:edgeIRI pvar:destination >> ,
    << << pvar:source pvar:edgeIRI pvar:destination >> rdf:type pgo:Edge >> .

prec:RdfStarOccurrence a prec:EdgeTemplate ;
  prec:selfIs pvar:edge ;
  prec:produces
    << pvar:edge prec:occurrenceOf << pvar:source pvar:edgeIRI pvar:destination >> >> ,
    << pvar:edge rdf:type pgo:Edge >> .

prec:SingletonProperty a prec:EdgeTemplate ;
  prec:selfIs pvar:edge ;
  prec:produces
    << pvar:source pvar:edge pvar:destination >> ,
    << pvar:edge rdf:singletonPropertyOf pvar:edgeIRI >> ,
    << pvar:edge rdf:type pgo:Edge >> .

prec:subject     a prec:SubstitutionPredicate ; prec:substitutionTarget rdf:subject .
prec:predicate   a prec:SubstitutionPredicate ; prec:substitutionTarget rdf:predicate .
prec:object      a prec:SubstitutionPredicate ; prec:substitutionTarget rdf:object .
prec:edgeIRI     a prec:SubstitutionPredicate ; prec:substitutionTarget pvar:edgeIRI .
prec:propertyIRI a prec:SubstitutionPredicate ; prec:substitutionTarget pvar:propertyKey .
prec:propertyValue a prec:SubstitutionPredicate ; prec:substitutionTarget pvar:propertyValue .
prec:nodeLabelIRI a prec:SubstitutionPredicate ; prec:substitutionTarget pvar:nodeLabelIRI .

prec:Prec0Property a prec:PropertyTemplate ;
  prec:selfIs pvar:propertyNode ;
  prec:produces
    << pvar:holder       pvar:propertyKey pvar:propertyNode     >> ,
    << pvar:propertyNode rdf:value        pvar:propertyValue    >> ,
    << pvar:propertyNode rdf:type         prec:PropertyKeyValue >> .

prec:DirectTriples a prec:PropertyTemplate ;
  prec:selfIs   << pvar:holder pvar:propertyKey pvar:propertyValue >> ;
  prec:produces << pvar:holder pvar:propertyKey pvar:propertyValue >> .

prec:NodeLabelsTypeOfLabelIRI a prec:NodeLabelTemplate ;
  prec:produces << pvar:node rdf:type pvar:nodeLabelIRI >> .
"""


@dataclass(frozen=True)
class RuleDomain:
    rule_type: Term
    default_template: Term
    main_label: Term
    possible_conditions: tuple
    template_bases: tuple
    shortcut_iri: Term
    substitution_predicate: Term
    self_identity_is: Term | None
    self_identity_heuristic: tuple


EDGE_DOMAIN = RuleDomain(
    prec("EdgeRule"), prec("RDFReification"), prec("label"),
    (prec("sourceLabel"), prec("destinationLabel")),
    (prec("Edges"),),
    prec("IRIOfEdgeLabel"), prec("edgeIRI"), prec("selfIs"),
    ((pvar("edge"),), (pvar("self"),),
     (pvar("source"), pvar("edgeIRI"), pvar("destination"))),
)

PROPERTY_DOMAIN = RuleDomain(
    prec("PropertyRule"), prec("Prec0Property"), prec("propertyKey"),
    (prec("label"), prec("onKind")),
    (prec("NodeProperties"), prec("EdgeProperties"), prec("MetaProperties")),
    prec("IRIOfProperty"), prec("propertyIRI"), prec("selfIs"),
    ((pvar("propertyNode"),), (pvar("self"),),
     (pvar("holder"), pvar("propertyKey"), pvar("propertyValue")),
     (pvar("holder"), pvar("propertyKey"), pvar("individualValue"))),
)

NODE_LABEL_DOMAIN = RuleDomain(
    prec("NodeLabelRule"), prec("NodeLabelsTypeOfLabelIRI"), prec("label"),
    (),
    (prec("NodeLabels"),),
    prec("IRIOfNodeLabel"), prec("nodeLabelIRI"), None,
    (),
)

_SYNONYMS = {
    prec("RelationshipRule"): prec("EdgeRule"),
    prec("RelationshipTemplate"): prec("EdgeTemplate"),
    prec("Relationships"): prec("Edges"),
    prec("RelationshipProperties"): prec("EdgeProperties"),
    prec("IRIOfRelationshipLabel"): prec("IRIOfEdgeLabel"),
    prec("relationshipIRI"): prec("edgeIRI"),
    pvar("relationshipIRI"): pvar("edgeIRI"),
    pvar("relationship"): pvar("edge"),
}


@dataclass
class Template:
    quads: list[Quad]
    self_is: list[Term]


@dataclass
class PreccRule:
    identity: Term
    label: str | None  # main label condition (edge label / property key)
    explicit_priority: int | None
    other: list[tuple[Term, Term]]  # (condition predicate, value)
    templates: dict[Term, Template] = field(default_factory=dict)  # base -> template
    #: optional output named graph (prec:targetGraph engine extension,
    #: same contract as the PRSC dialect — contexts/model.py)
    graph: Term | None = None

    @property
    def priority_key(self):
        cond_repr = json.dumps(
            {
                "label": self.label,
                "otherLength": -len(self.other),
                "other": sorted((k.nt(), v.nt()) for k, v in self.other),
            },
            sort_keys=True,
        )
        if self.explicit_priority is None:
            return (0, 0, cond_repr)
        return (1, self.explicit_priority, cond_repr)


@dataclass
class DomainCatalog:
    domain: RuleDomain
    base_templates: dict[Term, Template]  # template-base -> default template
    rules: list[PreccRule]  # priority-sorted


class PreccContext:
    def __init__(self, context_quads):
        ds = QuadSet(parse_turtle(BUILTIN_TEMPLATES_TTL))
        for q in context_quads:
            ds.add(_replace_synonyms(q))
        self.ds = ds

        self.substitutions = {
            q.s: q.o for q in ds.match(p=prec("substitutionTarget"), g=DEFAULT_GRAPH)
        }

        self._sugar(EDGE_DOMAIN)
        self.edges = self._build_domain(EDGE_DOMAIN)
        self._sugar(PROPERTY_DOMAIN)
        self._fanout_properties()
        self.properties = self._build_domain(PROPERTY_DOMAIN)
        self._sugar(NODE_LABEL_DOMAIN)
        self.node_labels = self._build_domain(NODE_LABEL_DOMAIN)

        kp = self.ds.match(s=prec("KeepProvenance"), p=prec("flagState"))
        self.keep_provenance = True
        if kp and isinstance(kp[0].o, Literal):
            self.keep_provenance = kp[0].o.value not in ("false", "0")

        self.blank_node_mapping: dict[str, str] = {}
        for q in self.ds.match(p=prec("mapBlankNodesToPrefix")):
            if q.s in (pgo("Node"), pgo("Edge"), prec("PropertyKey")) and isinstance(
                q.o, NamedNode
            ):
                self.blank_node_mapping[q.s.value] = q.o.value

    @classmethod
    def from_turtle(cls, text: str) -> "PreccContext":
        return cls(parse_turtle(text))

    @property
    def has_target_graphs(self) -> bool:
        """True iff any rule routes its output to a named graph."""
        return any(
            r.graph is not None
            for cat in (self.edges, self.properties, self.node_labels)
            for r in cat.rules
        )

    # ------------------------------------------------------------------
    def _sugar(self, domain: RuleDomain):
        """`iri shortcut "label"` -> full rule (context-loader.ts:598-619)."""
        sugared = self.ds.match(p=domain.shortcut_iri, g=DEFAULT_GRAPH)
        n = 0
        for q in sugared:
            if not isinstance(q.o, Literal):
                raise ValueError(f"{domain.shortcut_iri.nt()} object must be a literal")
            n += 1
            rule = BlankNode(f"sugar_{domain.rule_type.value.split('#')[-1]}_{n}")
            self.ds.add(Quad(rule, rdf("type"), domain.rule_type, DEFAULT_GRAPH))
            self.ds.add(Quad(rule, domain.main_label, q.o, DEFAULT_GRAPH))
            self.ds.add(Quad(rule, domain.substitution_predicate, q.s, DEFAULT_GRAPH))
        self.ds.quads = [q for q in self.ds.quads if q not in set(sugared)]

    def _fanout_properties(self):
        """prec:Properties ?p ?o -> Node/Edge/MetaProperties ?p ?o."""
        out = []
        for q in self.ds.match(s=prec("Properties"), g=DEFAULT_GRAPH):
            for base in PROPERTY_DOMAIN.template_bases:
                out.append(Quad(base, q.p, q.o, DEFAULT_GRAPH))
        self.ds.quads = [
            q for q in self.ds.quads if not (q.s == prec("Properties") and q.g == DEFAULT_GRAPH)
        ]
        for q in out:
            self.ds.add(q)

    # ------------------------------------------------------------------
    def _split(self, rule_node: Term, domain: RuleDomain):
        label = None
        explicit_priority = None
        other: list[tuple[Term, Term]] = []
        templated_by = None
        substitutions: list[tuple[Term, Term]] = []
        graph = None
        for q in self.ds.match(s=rule_node, g=DEFAULT_GRAPH):
            if q.p == rdf("type"):
                continue
            if q.p == prec("targetGraph"):
                if graph is not None:
                    raise ValueError(f"{rule_node.nt()}: at most one prec:targetGraph")
                if not isinstance(q.o, NamedNode):
                    raise ValueError(f"{rule_node.nt()}: prec:targetGraph must be an IRI")
                graph = q.o
            elif q.p == domain.main_label:
                if label is not None:
                    raise ValueError(f"{q.p.nt()} should appear only once")
                if not isinstance(q.o, Literal):
                    raise ValueError(f"{q.p.nt()} value must be a literal")
                label = q.o.value
            elif q.p == prec("priority"):
                if not isinstance(q.o, Literal) or q.o.datatype != XSD_INTEGER:
                    raise ValueError("prec:priority must be an xsd:integer")
                explicit_priority = int(q.o.value)
            elif q.p in domain.possible_conditions:
                other.append((q.p, q.o))
            elif q.p == prec("templatedBy"):
                if templated_by is not None:
                    raise ValueError("prec:templatedBy should have at most one value")
                templated_by = q.o
            elif q.p in self.substitutions:
                substitutions.append((self.substitutions[q.p], q.o))
            else:
                raise ValueError(f"Unknown predicate {q.p.nt()} on rule {rule_node.nt()}")
        return label, explicit_priority, other, templated_by, substitutions, graph

    def _read_raw_template(self, template_node: Term, domain: RuleDomain) -> Template:
        quads = [
            q.o
            for q in self.ds.match(s=template_node, p=prec("produces"), g=DEFAULT_GRAPH)
        ]
        for q in quads:
            if not isinstance(q, Quad):
                raise ValueError("Object of prec:produces in a template must be a quad")
        self_is: list[Term] = []
        if domain.self_identity_is is not None:
            self_is = [
                q.o
                for q in self.ds.match(
                    s=template_node, p=domain.self_identity_is, g=DEFAULT_GRAPH
                )
            ]
            if not self_is:
                self_is = _implicit_self_identity(domain.self_identity_heuristic, quads)
        return Template(list(quads), self_is)

    def _build_template(self, materializations, domain: RuleDomain) -> Template:
        """_buildTemplate (context-loader.ts:323-355)."""
        template_name = domain.default_template
        subs: dict[Term, Term] = {}
        for templated_by, substitutions in materializations:
            for k, v in substitutions:
                subs.setdefault(k, v)
            if templated_by is not None:
                template_name = templated_by
                break
        raw = self._read_raw_template(template_name, domain)
        remap = lambda t: map_terms(t, lambda x: subs.get(x, x))  # noqa: E731
        return Template(
            [remap(q) for q in raw.quads],
            [remap(Quad(prec("_"), prec("_"), t)).o for t in raw.self_is],
        )

    def _build_domain(self, domain: RuleDomain) -> DomainCatalog:
        base_templates: dict[Term, Template] = {}
        base_mats: dict[Term, tuple] = {}
        for base in domain.template_bases:
            label, prio, other, templated_by, subs, graph = self._split(base, domain)
            if label is not None or prio is not None or other or graph is not None:
                raise ValueError(f"{base.nt()} may only carry a template/substitutions")
            base_mats[base] = (templated_by, subs)
            base_templates[base] = self._build_template([(templated_by, subs)], domain)

        rules: list[PreccRule] = []
        seen_conditions: set[str] = set()
        for q in self.ds.match(p=rdf("type"), o=domain.rule_type, g=DEFAULT_GRAPH):
            label, prio, other, templated_by, subs, graph = self._split(q.s, domain)
            if label is None and not other:
                raise ValueError(f"Rule {q.s.nt()} has no condition")
            rule = PreccRule(q.s, label, prio, other, graph=graph)
            cond_key = rule.priority_key[2]
            if cond_key in seen_conditions:
                raise ValueError(f"Two rules have the exact same target: {q.s.nt()}")
            seen_conditions.add(cond_key)
            for base in domain.template_bases:
                rule.templates[base] = self._build_template(
                    [(templated_by, subs), base_mats[base]], domain
                )
            rules.append(rule)

        rules.sort(key=lambda r: r.priority_key)
        return DomainCatalog(domain, base_templates, rules)


def _replace_synonyms(q: Quad) -> Quad:
    remapped = map_terms(q, lambda t: _SYNONYMS.get(t, t))
    return Quad(remapped.s, remapped.p, remapped.o, q.g)


def _implicit_self_identity(heuristics, quads: list[Quad]) -> list[Term]:
    """findImplicitSelfIdentity (context-loader.ts:370-385)."""
    def is_main_component(term: Term, quad: Quad) -> bool:
        return term in (quad.s, quad.p, quad.o)

    for searched in heuristics:
        c = [q for q in quads if all(is_main_component(t, q) for t in searched)]
        if not c:
            continue
        if len(searched) == 1:
            return [searched[0]]
        distinct = list(dict.fromkeys(c))
        if len(distinct) != 1:
            return []
        return [distinct[0]]
    return []
