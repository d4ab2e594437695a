"""Generate the offline Bio_ClinicalBERT-shaped vocab fixture.

Bio_ClinicalBERT uses the bert-base-cased WordPiece vocabulary (28996
entries). The real file is not redistributable from this offline image, so
this script deterministically generates a drop-in replacement with:

  * the canonical bert-base-cased special-token layout
    ([PAD]=0, [unused*]=1..99, [UNK]=100, [CLS]=101, [SEP]=102, [MASK]=103);
  * full printable-ASCII single-character coverage (start + '##'
    continuation forms) so NO alphanumeric word ever maps to [UNK];
  * two-letter start pieces and two/three-letter continuation pieces so
    arbitrary English/medical words split into short subwords;
  * a curated medical + common-English wordlist covering the framework's
    caption templates, modality prompts, and CheXpert task names;
  * [unusedN] padding to exactly 28996 entries (= the configured
    text.vocab_size, so converted BERT embedding tables line up).

Run:  python scripts/make_vocab_fixture.py
Writes: medmoe_tpu/data/fixtures/bio_clinical_bert_vocab.txt

Reference anchors: the tokenizer the reference builds at
src/models/components/med_moe.py:32 (AutoTokenizer Bio_ClinicalBERT) and the
vocab-size contract at configs/model/med-moe.yaml.
"""

from __future__ import annotations

import itertools
import os
import string

TARGET_SIZE = 28996
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "medmoe_tpu", "data", "fixtures",
                   "bio_clinical_bert_vocab.txt")

MEDICAL_WORDS = """
the a an of in on with without and or to for is are was were shows showing
seen noted present absent no not normal abnormal unremarkable impression
finding findings image images photo picture scan study exam examination
view views frontal lateral axial coronal sagittal left right bilateral
upper lower anterior posterior medial distal proximal mild moderate severe
acute chronic diffuse focal patchy small large this that there evidence
suggestive consistent compatible comparison prior stable increased decreased
interval change changes within limits clear status post
xray x ray rays radiograph radiographs radiography chest abdomen abdominal
pelvis pelvic spine cervical thoracic lumbar skull bone bones rib ribs
ct computed tomography mri magnetic resonance imaging ultrasound sonogram
sonography doppler echo echocardiogram pet fluoroscopy mammogram mammography
angiogram angiography histopathology pathology histology microscopy slide
stained stain hematoxylin eosin fundus retina retinal oct endoscopy
lung lungs pulmonary pleural heart cardiac cardiomediastinal mediastinum
mediastinal vascular vasculature aorta aortic hilar hila carina trachea
bronchi bronchial airways diaphragm costophrenic cardiophrenic apex apices
liver hepatic spleen splenic kidney kidneys renal bladder bowel colon
stomach gastric pancreas pancreatic gallbladder biliary thyroid breast
brain cerebral cerebellum ventricle ventricles ventricular white gray
matter cortex cortical muscle muscles tendon ligament meniscus acl knee
shoulder hip joint joints tissue tissues soft cell cells nucleus nuclei
gland glands node nodes lymph
pneumonia pneumothorax effusion effusions edema atelectasis consolidation
consolidations opacity opacities infiltrate infiltrates cardiomegaly
enlarged enlargement lesion lesions mass masses nodule nodules tumor tumors
cancer carcinoma malignant malignancy benign metastasis metastases fracture
fractures dislocation degenerative emphysema fibrosis scarring granuloma
calcification calcified cyst cysts hernia stenosis aneurysm thrombosis
embolism pneumoperitoneum ascites hemorrhage bleeding infection inflammatory
inflammation abscess ulcer ischemia infarct infarction stroke
device devices support tube tubes line lines catheter pacemaker wires
sternotomy clips surgical prosthesis valve stent drain picc port
patient history clinical diagnosis disease disorder syndrome symptom
symptoms treatment therapy followup follow up report reports reveals
demonstrated demonstrates demonstrating visualized identified suspicious
concerning recommend recommended correlation
radimagenet mimiccxr chexpert chestxray roco pmcoa quilt openi slake
unimed noreportpresent modality modalities
atelectasis cardiomegaly consolidation edema pleural effusion
pathologic microscopic tissue histologic specimen biopsy resection
ultrasonography transverse longitudinal echogenic hypoechoic hyperechoic
anechoic cystic solid vascularity gestational fetal
flair weighted contrast enhancement enhancing gadolinium diffusion
signal intensity hyperintense hypointense t1 t2
is of photo this
zero one two three four five six seven eight nine ten
""".split()

SUFFIX_PIECES = """
s es ed ing ly er est ion tion ation sion ment ness ity ous ive al ial ic
ical ar ary ory ate ist ism ize ise able ible ence ance ency ancy ful less
itis oma omas osis oses pathy plasty ectomy ostomy otomy scopy graphy gram
grams megaly algia emia uria ptosis sclerosis stenosis genic genesis logy
logist plasia trophy phyma rrhage rrhea cele centesis desis lysis pexy
""".split()


def build() -> list:
    vocab = ["[PAD]"]
    vocab += [f"[unused{i}]" for i in range(99)]            # ids 1..99
    vocab += ["[UNK]", "[CLS]", "[SEP]", "[MASK]"]          # 100..103

    seen = set(vocab)

    def add(tok: str) -> None:
        if tok not in seen:
            seen.add(tok)
            vocab.append(tok)

    # printable ASCII single chars + continuation forms: total [UNK]-freedom
    for ch in string.printable:
        if ch.isspace():
            continue
        add(ch)
        add("##" + ch)

    lower = string.ascii_lowercase
    # two-letter start + continuation pieces
    for a, b in itertools.product(lower, lower):
        add(a + b)
        add("##" + a + b)
    # common suffixes as continuation pieces (longest-match beats 2-grams)
    for s in SUFFIX_PIECES:
        add("##" + s)
    # curated words (start-of-word form + capitalized variant)
    for w in MEDICAL_WORDS:
        add(w)
        add(w.capitalize())
    # three-letter continuation pieces fill most of the space
    for a, b, c in itertools.product(lower, lower, lower):
        if len(vocab) >= TARGET_SIZE:
            break
        add("##" + a + b + c)

    i = 99
    while len(vocab) < TARGET_SIZE:
        tok = f"[unused{i}]"
        if tok not in seen:
            seen.add(tok)
            vocab.append(tok)
        i += 1
    return vocab[:TARGET_SIZE]


def main() -> None:
    vocab = build()
    assert len(vocab) == TARGET_SIZE
    assert len(set(vocab)) == TARGET_SIZE
    assert vocab[0] == "[PAD]" and vocab[100] == "[UNK]"
    assert vocab[101] == "[CLS]" and vocab[102] == "[SEP]"
    assert vocab[103] == "[MASK]"
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w", encoding="utf-8") as f:
        f.write("\n".join(vocab) + "\n")
    print(f"wrote {len(vocab)} tokens to {OUT}")


if __name__ == "__main__":
    main()
