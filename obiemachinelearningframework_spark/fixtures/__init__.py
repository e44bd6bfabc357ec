from .ontology import Ontology, code_ontology, disease_ontology, soccer_ontology  # noqa: F401
from .corpus import generate_corpus  # noqa: F401
