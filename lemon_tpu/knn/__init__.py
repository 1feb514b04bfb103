from lemon_tpu.knn.index import ExactKnnIndex, numpy_search, train_split_exclusion
