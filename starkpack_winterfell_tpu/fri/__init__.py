from .channel import DefaultProverChannel
from .options import FriOptions
from .proof import FriProof, FriProofLayer
from .prover import FriProver, apply_drp, fold_positions
from .verifier import FriVerificationError, FriVerifier, VerifierChannelFri
