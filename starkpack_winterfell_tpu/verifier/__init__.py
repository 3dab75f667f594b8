from .channel import VerifierChannel, VerifierError
from .verifier import verify
