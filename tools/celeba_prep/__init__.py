"""CelebA dataset preparation pipeline (reference: data/celeba/scripts/).

Run order:
  1. make_images_folder.py       - regroup raw images/captions by identity
  2. make_final_img_txt.py       - renumber ids, resize 112, augment to >=5/subject
  3. create_train_test_filenames.py - 4500/500/1217 split -> pickles
  4. test_list_identification.py - verification/identification pair lists
  5. transform_fair.py           - heavier fairness-split augmentation
"""
