# loop closure: FAST+BRIEF, retrieval, geometric verification, 4-DoF pose graph
