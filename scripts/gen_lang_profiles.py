"""Train the char-trigram language-ID profiles fixture.

Cavnar & Trenkle-style (1994, "N-Gram-Based Text Categorization", public
method): per language, rank the character trigrams of a small sample corpus
by frequency, keep the top K, weight = K - rank. The fixture is committed
(ocr_spark/resources/lang_profiles.tsv) so both engines score against the
same literal table; re-run this script only to retrain:

    python scripts/gen_lang_profiles.py

Sample corpora are short common-phrase texts authored for this repo (no
external downloads — the container is offline). Held-out test sentences
live in tests/test_training_ops.py, NOT here: training on the test set
would make the accuracy test meaningless.
"""

from __future__ import annotations

import os
from collections import Counter

TOP_K = 100

SAMPLES: dict[str, str] = {
    "en": (
        "the quick brown fox jumps over the lazy dog. this is a simple "
        "sentence written in plain english with common words that people "
        "use every day. we should think about what the weather will be "
        "like tomorrow and whether it is going to rain again. there are "
        "many things to do and not enough time to do them all. the "
        "children were playing in the garden while their parents watched."
   
        "good morning everyone and thank you for coming here today. i would like to know how much this costs and where we can find something to eat. she said that they will arrive next week with their friends."
    ),
    "de": (
        "der schnelle braune fuchs springt über den faulen hund. dies ist "
        "ein einfacher satz in deutscher sprache mit häufigen wörtern die "
        "man jeden tag benutzt. wir sollten darüber nachdenken wie das "
        "wetter morgen wird und ob es wieder regnen wird. es gibt viele "
        "dinge zu tun und nicht genug zeit. die kinder spielten im garten "
        "während ihre eltern zuschauten und kaffee tranken."
   
        "guten morgen zusammen und vielen dank dass sie heute hierher gekommen sind. ich möchte wissen wie viel das kostet und wo wir etwas zu essen finden können. sie sagte dass sie nächste woche mit ihren freunden ankommen werden."
    ),
    "fr": (
        "le rapide renard brun saute par dessus le chien paresseux. ceci "
        "est une phrase simple écrite en français avec des mots courants "
        "que les gens utilisent tous les jours. nous devrions penser au "
        "temps qu'il fera demain et savoir s'il va encore pleuvoir. il y a "
        "beaucoup de choses à faire et pas assez de temps. les enfants "
        "jouaient dans le jardin pendant que leurs parents regardaient."
   
        "bonjour à tous et merci d'être venus ici aujourd'hui. je voudrais savoir combien cela coûte et où nous pouvons trouver quelque chose à manger. elle a dit qu'ils arriveront la semaine prochaine avec leurs amis. c'est une belle journée pour se promener dans la ville."
    ),
    "es": (
        "el rápido zorro marrón salta sobre el perro perezoso. esta es una "
        "frase sencilla escrita en español con palabras comunes que la "
        "gente usa todos los días. deberíamos pensar en cómo estará el "
        "tiempo mañana y si va a llover otra vez. hay muchas cosas que "
        "hacer y no hay suficiente tiempo para hacerlas todas. los niños "
        "jugaban en el jardín mientras sus padres los miraban."
   
        "buenos días a todos y gracias por venir aquí hoy. me gustaría saber cuánto cuesta esto y dónde podemos encontrar algo para comer. ella dijo que llegarán la próxima semana con sus amigos."
    ),
    "pt": (
        "a rápida raposa marrom pula sobre o cachorro preguiçoso. esta é "
        "uma frase simples escrita em português com palavras comuns que as "
        "pessoas usam todos os dias. devemos pensar em como estará o tempo "
        "amanhã e se vai chover de novo. há muitas coisas para fazer e não "
        "há tempo suficiente para fazer todas. as crianças brincavam no "
        "jardim enquanto os pais olhavam."
   
        "bom dia a todos e obrigado por virem aqui hoje. eu gostaria de saber quanto isso custa e onde podemos encontrar algo para comer. ela disse que eles chegarão na próxima semana com seus amigos."
    ),
    "it": (
        "la veloce volpe marrone salta sopra il cane pigro. questa è una "
        "frase semplice scritta in italiano con parole comuni che la gente "
        "usa ogni giorno. dovremmo pensare a come sarà il tempo domani e "
        "se pioverà di nuovo. ci sono molte cose da fare e non c'è "
        "abbastanza tempo per farle tutte. i bambini giocavano in giardino "
        "mentre i loro genitori guardavano."
   
        "buongiorno a tutti e grazie per essere venuti qui oggi. vorrei sapere quanto costa questo e dove possiamo trovare qualcosa da mangiare. ha detto che arriveranno la settimana prossima con i loro amici."
    ),
    "nl": (
        "de snelle bruine vos springt over de luie hond. dit is een "
        "eenvoudige zin geschreven in het nederlands met gewone woorden "
        "die mensen elke dag gebruiken. we zouden moeten nadenken over hoe "
        "het weer morgen wordt en of het weer gaat regenen. er zijn veel "
        "dingen te doen en niet genoeg tijd om ze allemaal te doen. de "
        "kinderen speelden in de tuin terwijl hun ouders toekeken."
   
        "goedemorgen allemaal en bedankt dat jullie vandaag hierheen zijn gekomen. ik wil graag weten hoeveel dit kost en waar we iets te eten kunnen vinden. ze zei dat ze volgende week met hun vrienden zullen aankomen. het is een mooie dag om door de stad te wandelen."
    ),
    "sv": (
        "den snabba bruna räven hoppar över den lata hunden. detta är en "
        "enkel mening skriven på svenska med vanliga ord som människor "
        "använder varje dag. vi borde fundera på hur vädret blir imorgon "
        "och om det kommer att regna igen. det finns många saker att göra "
        "och inte tillräckligt med tid att göra dem alla. barnen lekte i "
        "trädgården medan deras föräldrar tittade på."
   
        "god morgon allihopa och tack för att ni kom hit idag. jag skulle vilja veta hur mycket det här kostar och var vi kan hitta något att äta. hon sa att de kommer att anlända nästa vecka med sina vänner. det är en vacker dag att promenera i staden och titta på människorna."
    ),
    "da": (
        "den hurtige brune ræv hopper over den dovne hund. dette er en "
        "enkel sætning skrevet på dansk med almindelige ord som folk "
        "bruger hver dag. vi burde tænke over hvordan vejret bliver i "
        "morgen og om det kommer til at regne igen. der er mange ting at "
        "gøre og ikke nok tid til at gøre dem alle. børnene legede i haven "
        "mens deres forældre så på."
   
        "godmorgen allesammen og tak fordi i kom her i dag. jeg vil gerne vide hvor meget det her koster og hvor vi kan finde noget at spise. hun sagde at de vil ankomme i næste uge sammen med deres venner."
    ),
    "no": (
        "den raske brune reven hopper over den late hunden. dette er en "
        "enkel setning skrevet på norsk med vanlige ord som folk bruker "
        "hver dag. vi burde tenke på hvordan været blir i morgen og om det "
        "kommer til å regne igjen. det er mange ting å gjøre og ikke nok "
        "tid til å gjøre dem alle. barna lekte i hagen mens foreldrene "
        "deres så på."
   
        "god morgen alle sammen og takk for at dere kom hit i dag. jeg vil gjerne vite hvor mye dette koster og hvor vi kan finne noe å spise. hun sa at de vil ankomme neste uke sammen med vennene sine. det er en fin dag å gå en tur i byen og se på folk."
    ),
    "fi": (
        "nopea ruskea kettu hyppää laiskan koiran yli. tämä on "
        "yksinkertainen lause kirjoitettu suomeksi tavallisilla sanoilla "
        "joita ihmiset käyttävät joka päivä. meidän pitäisi miettiä "
        "millainen sää on huomenna ja sataako taas vettä. on paljon "
        "tehtävää eikä tarpeeksi aikaa tehdä niitä kaikkia. lapset "
        "leikkivät puutarhassa kun heidän vanhempansa katselivat."
   
        "hyvää huomenta kaikille ja kiitos että tulitte tänne tänään. haluaisin tietää kuinka paljon tämä maksaa ja mistä voimme löytää jotain syötävää. hän sanoi että he saapuvat ensi viikolla ystäviensä kanssa."
    ),
    "pl": (
        "szybki brązowy lis przeskakuje nad leniwym psem. to jest proste "
        "zdanie napisane po polsku zwykłymi słowami których ludzie używają "
        "każdego dnia. powinniśmy pomyśleć jaka będzie pogoda jutro i czy "
        "znowu będzie padać deszcz. jest wiele rzeczy do zrobienia i nie "
        "ma wystarczająco dużo czasu żeby zrobić je wszystkie. dzieci "
        "bawiły się w ogrodzie podczas gdy ich rodzice patrzyli."
   
        "dzień dobry wszystkim i dziękuję że przyszliście tutaj dzisiaj. chciałbym wiedzieć ile to kosztuje i gdzie możemy znaleźć coś do jedzenia. powiedziała że przyjadą w przyszłym tygodniu ze swoimi przyjaciółmi."
    ),
    "cs": (
        "rychlá hnědá liška skáče přes líného psa. toto je jednoduchá věta "
        "napsaná česky běžnými slovy která lidé používají každý den. měli "
        "bychom přemýšlet jaké bude zítra počasí a jestli bude zase pršet. "
        "je mnoho věcí které je třeba udělat a není dost času udělat je "
        "všechny. děti si hrály na zahradě zatímco jejich rodiče se "
        "dívali."
   
        "dobré ráno všem a děkuji že jste sem dnes přišli. chtěl bych vědět kolik to stojí a kde můžeme najít něco k jídlu. řekla že přijedou příští týden se svými přáteli. je krásný den na procházku městem."
    ),
    "ro": (
        "vulpea maro rapidă sare peste câinele leneș. aceasta este o "
        "propoziție simplă scrisă în română cu cuvinte obișnuite pe care "
        "oamenii le folosesc în fiecare zi. ar trebui să ne gândim cum va "
        "fi vremea mâine și dacă va ploua din nou. sunt multe lucruri de "
        "făcut și nu este destul timp să le facem pe toate. copiii se "
        "jucau în grădină în timp ce părinții lor priveau."
   
        "bună dimineața tuturor și mulțumesc că ați venit aici astăzi. aș vrea să știu cât costă acest lucru și unde putem găsi ceva de mâncare. ea a spus că vor sosi săptămâna viitoare cu prietenii lor."
    ),
    "hu": (
        "a gyors barna róka átugrik a lusta kutya felett. ez egy egyszerű "
        "mondat magyarul írva gyakori szavakkal amelyeket az emberek "
        "minden nap használnak. el kellene gondolkodnunk azon hogy milyen "
        "lesz az idő holnap és hogy esik-e megint az eső. sok tennivaló "
        "van és nincs elég idő mindet megcsinálni. a gyerekek a kertben "
        "játszottak miközben a szüleik nézték őket."
   
        "jó reggelt mindenkinek és köszönöm hogy ma eljöttek ide. szeretném tudni hogy mennyibe kerül ez és hol találunk valamit enni. azt mondta hogy jövő héten érkeznek a barátaikkal."
    ),
    "tr": (
        "hızlı kahverengi tilki tembel köpeğin üzerinden atlar. bu "
        "türkçe yazılmış insanların her gün kullandığı yaygın kelimelerle "
        "basit bir cümledir. yarın havanın nasıl olacağını ve yine yağmur "
        "yağıp yağmayacağını düşünmeliyiz. yapılacak çok şey var ve "
        "hepsini yapmak için yeterli zaman yok. çocuklar bahçede oynarken "
        "anne babaları onları izliyordu."
   
        "herkese günaydın ve bugün buraya geldiğiniz için teşekkür ederim. bunun ne kadar tuttuğunu ve yiyecek bir şeyi nerede bulabileceğimizi öğrenmek istiyorum. gelecek hafta arkadaşlarıyla birlikte gelecekler dedi."
    ),
    "id": (
        "rubah coklat yang cepat melompati anjing yang malas. ini adalah "
        "kalimat sederhana yang ditulis dalam bahasa indonesia dengan kata "
        "kata umum yang digunakan orang setiap hari. kita harus memikirkan "
        "bagaimana cuaca besok dan apakah akan hujan lagi. ada banyak hal "
        "yang harus dilakukan dan tidak cukup waktu untuk melakukan "
        "semuanya. anak anak bermain di kebun sementara orang tua mereka "
        "menonton."
   
        "selamat pagi semuanya dan terima kasih sudah datang ke sini hari ini. saya ingin tahu berapa harga ini dan di mana kita bisa menemukan sesuatu untuk dimakan. dia bilang mereka akan tiba minggu depan bersama teman teman mereka."
    ),
    "vi": (
        "con cáo nâu nhanh nhẹn nhảy qua con chó lười biếng. đây là một "
        "câu đơn giản được viết bằng tiếng việt với những từ thông dụng mà "
        "mọi người dùng hàng ngày. chúng ta nên nghĩ xem thời tiết ngày "
        "mai sẽ thế nào và liệu trời có mưa nữa không. có nhiều việc phải "
        "làm và không đủ thời gian để làm tất cả. bọn trẻ chơi trong vườn "
        "trong khi bố mẹ chúng ngồi xem."
   
        "chào buổi sáng mọi người và cảm ơn các bạn đã đến đây hôm nay. tôi muốn biết cái này giá bao nhiêu và chúng ta có thể tìm đồ ăn ở đâu. cô ấy nói rằng họ sẽ đến vào tuần tới cùng với bạn bè của họ."
    ),
    "sw": (
        "mbweha mwepesi wa kahawia anaruka juu ya mbwa mvivu. hii ni "
        "sentensi rahisi iliyoandikwa kwa kiswahili kwa maneno ya kawaida "
        "ambayo watu hutumia kila siku. tunapaswa kufikiria hali ya hewa "
        "itakuwaje kesho na kama mvua itanyesha tena. kuna mambo mengi ya "
        "kufanya na hakuna muda wa kutosha kuyafanya yote. watoto "
        "walicheza bustanini wakati wazazi wao wakiwatazama."
   
        "habari za asubuhi nyote na asante kwa kuja hapa leo. ningependa kujua hii inagharimu kiasi gani na wapi tunaweza kupata kitu cha kula. alisema kwamba watafika wiki ijayo pamoja na marafiki zao."
    ),
    "ru": (
        "быстрая коричневая лиса прыгает через ленивую собаку. это простое "
        "предложение написанное по русски обычными словами которые люди "
        "используют каждый день. нам следует подумать какая завтра будет "
        "погода и пойдёт ли снова дождь. есть много дел и не хватает "
        "времени чтобы сделать их все. дети играли в саду пока их родители "
        "смотрели на них."
   
        "доброе утро всем и спасибо что пришли сюда сегодня. я хотел бы узнать сколько это стоит и где мы можем найти что нибудь поесть. она сказала что они приедут на следующей неделе со своими друзьями."
    ),
    "el": (
        "η γρήγορη καφέ αλεπού πηδάει πάνω από τον τεμπέλη σκύλο. αυτή "
        "είναι μια απλή πρόταση γραμμένη στα ελληνικά με κοινές λέξεις που "
        "οι άνθρωποι χρησιμοποιούν κάθε μέρα. πρέπει να σκεφτούμε πώς θα "
        "είναι ο καιρός αύριο και αν θα βρέξει ξανά. υπάρχουν πολλά "
        "πράγματα να κάνουμε και δεν υπάρχει αρκετός χρόνος. τα παιδιά "
        "έπαιζαν στον κήπο ενώ οι γονείς τους τα παρακολουθούσαν."
   
        "καλημέρα σε όλους και ευχαριστώ που ήρθατε εδώ σήμερα. θα ήθελα να μάθω πόσο κοστίζει αυτό και πού μπορούμε να βρούμε κάτι να φάμε. είπε ότι θα φτάσουν την επόμενη εβδομάδα με τους φίλους τους."
    ),
}

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "ocr_spark", "resources", "lang_profiles.tsv",
)


def trigrams(text: str) -> list[str]:
    """SHARED normalization contract (must match lang_id_profile in
    ocr_spark/operators/text_analysis.py): lowercase, collapse whitespace
    runs to one space, pad with one leading/trailing space, all 3-char
    substrings."""
    import re

    s = " " + re.sub(r"\s+", " ", text.lower()) + " "
    return [s[i : i + 3] for i in range(len(s) - 2)]


def main() -> None:
    rows = []
    for lang in sorted(SAMPLES):
        counts = Counter(trigrams(SAMPLES[lang]))
        # rank by count desc, gram asc (deterministic); weight = K - rank
        top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:TOP_K]
        for rank, (gram, _cnt) in enumerate(top):
            rows.append((lang, gram, TOP_K - rank))
    with open(OUT, "w", encoding="utf-8") as f:
        f.write("# lang\tgram\tweight — generated by scripts/gen_lang_profiles.py\n")
        for lang, gram, w in rows:
            f.write(f"{lang}\t{gram}\t{w}\n")
    print(f"wrote {len(rows)} rows ({len(SAMPLES)} languages) to {OUT}")


if __name__ == "__main__":
    main()
