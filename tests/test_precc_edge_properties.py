"""Properties-on-edges corner cases (deep RDF-star nesting + holder
self-resolution), from
/root/reference/test/prec_impl/rules-for-properties-on-edges.test.ts."""

from prec_spark.rdf.isomorphism import isomorphic

from .test_precc_golden import run, to_triples


def test_property_mapped_to_rdf_subject_on_star_edge(spark):
    graph = """
      :source      a pgo:Node .
      :destination a pgo:Node .
      :edge a pgo:Edge ;
          rdf:subject   :source ;
          rdf:predicate :predicate ;
          rdf:object    :destination ;
          :property     :property_vn .
      :predicate rdfs:label "Label" .
      :property rdfs:label "Subject" ; a prec:PropertyKey, prec:CreatedPropertyKey .
      :property_vn a prec:PropertyKeyValue ; rdf:value "Value" .
    """
    ctx = """
      [] a prec:PropertyRule ;
        prec:propertyKey "Subject" ;
        prec:propertyIRI rdf:subject ;
        prec:templatedBy prec:DirectTriples .
      prec:Edges prec:templatedBy prec:RdfStarUnique .
    """
    expected = to_triples("""
      :source      a pgo:Node .
      :destination a pgo:Node .
      :source :predicate :destination .
      << :source :predicate :destination >> a pgo:Edge .
      << :source :predicate :destination >> rdf:subject "Value" .
      :predicate rdfs:label "Label" .
    """)
    assert isomorphic(run(spark, graph, ctx), expected)


def test_deeply_nested_templates_with_reversed_self(spark):
    graph = """
      :edge a pgo:Edge ;
        rdf:subject   :s ;
        rdf:object    :o ;
        rdf:predicate :p .
      :s a pgo:Node .
      :o a pgo:Node .
      :p rdfs:label "TheEdge" ; a prec:CreatedEdgeLabel .
      :edge :flies :propertyNode .
      :flies a prec:CreatedPropertyKey, prec:PropertyKey ; rdfs:label "theProp" .
      :propertyNode a prec:PropertyKeyValue ; rdf:value "Hey" .
    """
    ctx = """
      prec:Edges prec:templatedBy [
        prec:produces << << pvar:source pvar:edgeIRI pvar:destination >> :isA :triple >> ;
        prec:selfIs        << pvar:destination pvar:edgeIRI pvar:source >>
      ] .
      prec:Properties prec:templatedBy [
        prec:produces
          <<
            <<
              << pvar:propertyKey :isA :property >>
              :withTheValue
              << :thatIs :valued pvar:propertyValue >>
            >>
            :isOnTheReversed
            << :theThing :named pvar:holder >>
          >>
      ] .
    """
    expected = to_triples("""
      << :s :p :o >> :isA :triple .
      <<
        << :flies :isA :property >>
        :withTheValue
        << :thatIs :valued "Hey" >>
      >>
      :isOnTheReversed
      << :theThing :named << :o :p :s >> >> .
      :flies a prec:CreatedPropertyKey, prec:PropertyKey ; rdfs:label "theProp" .
      :s a pgo:Node .
      :o a pgo:Node .
      :p rdfs:label "TheEdge" ; a prec:CreatedEdgeLabel .
    """)
    assert isomorphic(run(spark, graph, ctx), expected)


def test_cartesian_product_meta_properties(spark):
    """Meta-property on a multi-valued property: 5 x 3 cartesian
    instantiation (prec-c-rule-properties.test.ts:12-55)."""
    graph = """
      :node a pgo:Node ;
        :property [
          a prec:PropertyKeyValue ; rdf:value ( "A" "B" "C" "D" "E" ) ;
          :property [ a prec:PropertyKeyValue ; rdf:value ( 1 2 3 ) ]
        ] .
      :property a prec:PropertyKey, prec:CreatedPropertyKey ;
        rdfs:label "Property" .
    """
    ctx = """
      prec:Properties     prec:templatedBy prec:CartesianProduct .
      prec:KeepProvenance prec:flagState false .
      prec:CartesianProduct a prec:PropertyTemplate ;
        prec:produces << pvar:holder pvar:propertyKey pvar:individualValue >> ;
        prec:selfIs << pvar:holder pvar:propertyKey pvar:individualValue >> .
      [] a prec:PropertyRule ;
        prec:propertyKey "Property" ;
        prec:propertyIRI :element .
    """
    values = '"A", "B", "C", "D", "E"'
    metas = "\n".join(
        f'<< :node :element "{v}" >> :element {n} .'
        for v in "ABCDE" for n in (1, 2, 3)
    )
    expected = to_triples(f":node :element {values} .\n{metas}")
    assert isomorphic(run(spark, graph, ctx), expected)
