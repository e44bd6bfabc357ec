from .ontology import Ontology, soccer_ontology, disease_ontology  # noqa: F401
from .corpus import generate_corpus  # noqa: F401
